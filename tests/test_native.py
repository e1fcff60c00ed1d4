"""Native library (libdlqio.so) tests: builds via make, parity vs NumPy/PIL
reference paths."""

import numpy as np
import pytest

from dlq_tpu import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("native toolchain unavailable")
    return native.get_lib()


def test_read_write_roundtrip(lib, tmp_path):
    x = np.random.default_rng(0).normal(0, 1, 1000).astype(np.float32)
    p = str(tmp_path / "t.bin")
    x.tofile(p)
    back = native.read_f32(p, 1000)
    np.testing.assert_array_equal(back, x)


def test_read_size_validation(lib, tmp_path):
    p = str(tmp_path / "bad.bin")
    np.zeros(10, np.float32).tofile(p)
    with pytest.raises(ValueError, match="size mismatch|failed"):
        native.read_f32(p, 99)


def test_read_many_parallel(lib, tmp_path):
    rng = np.random.default_rng(0)
    arrays = [rng.normal(0, 1, n).astype(np.float32) for n in (100, 2000, 1, 4096)]
    paths = []
    for i, a in enumerate(arrays):
        p = str(tmp_path / f"w{i}.bin")
        a.tofile(p)
        paths.append(p)
    arena, offsets = native.read_f32_many(paths, [len(a) for a in arrays], threads=4)
    for a, o in zip(arrays, offsets):
        np.testing.assert_array_equal(arena[o : o + len(a)], a)


def test_pack_unpack_int4_native(lib):
    q = np.random.default_rng(0).integers(-8, 8, (64, 32)).astype(np.int8)
    packed = native.pack_int4_native(q)
    assert packed.shape == (32, 32)
    back = native.unpack_int4_native(packed, 64)
    np.testing.assert_array_equal(back, q)
    # parity with the jnp packing used by kernels
    from dlq_tpu.quant.quantize import pack_int4
    import jax.numpy as jnp

    np.testing.assert_array_equal(np.asarray(pack_int4(jnp.asarray(q))), packed)


def test_preprocess_matches_pil(lib):
    """Native bilinear+crop+normalize vs the PIL reference within tolerance
    (both use half-pixel-center bilinear)."""
    # smooth natural-image-like input (PIL box-filters large downscales,
    # the native path point-samples 2x2 — they agree on smooth content,
    # diverge on per-pixel noise by construction)
    yy, xx = np.mgrid[0:300, 0:400]
    img = np.stack([
        (127 + 120 * np.sin(yy / 40.0)),
        (127 + 120 * np.cos(xx / 55.0)),
        (yy + xx) % 256,
    ], -1).astype(np.uint8)
    out_native = native.preprocess_batch_u8([img], resize_to=64, size=56)
    from dlq_tpu.data.preprocess import imagenet_preprocess_np

    out_pil = imagenet_preprocess_np(img, size=56, resize_to=64)
    diff = np.abs(out_native[0] - out_pil[0])
    assert np.mean(diff) < 0.2
    assert np.corrcoef(out_native.ravel(), out_pil.ravel())[0, 1] > 0.97


def test_preprocess_batch_threads(lib):
    rng = np.random.default_rng(1)
    imgs = [rng.integers(0, 256, (s, s + 7, 3)).astype(np.uint8) for s in (64, 100, 250)]
    out = native.preprocess_batch_u8(imgs, resize_to=64, size=56, threads=3)
    assert out.shape == (3, 56, 56, 3)
    assert np.isfinite(out).all()

"""Data-layer tests: ImageNet preprocess semantics, bin round-trip."""

import numpy as np

from dlq_tpu.data.mnist import load_mnist_bin, save_mnist_bin, synthetic_mnist
from dlq_tpu.data.preprocess import imagenet_preprocess_np, synthetic_imagenet, to_bin


def test_preprocess_shape_and_stats():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (300, 400, 3)).astype(np.uint8)
    out = imagenet_preprocess_np(img, size=224, resize_to=256)
    assert out.shape == (1, 224, 224, 3)
    # normalized: roughly centered
    assert abs(float(out.mean())) < 1.0
    assert np.isfinite(out).all()


def test_preprocess_portrait_landscape():
    rng = np.random.default_rng(1)
    for h, w in ((500, 200), (200, 500)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        out = imagenet_preprocess_np(img, size=96, resize_to=128)
        assert out.shape == (1, 96, 96, 3)


def test_mnist_bin_roundtrip(tmp_path):
    X, Y = synthetic_mnist(64, seed=0)
    save_mnist_bin(str(tmp_path), X, Y, "train")
    X2, Y2 = load_mnist_bin(str(tmp_path), "train")
    np.testing.assert_array_equal(X2, X)
    np.testing.assert_array_equal(Y2, Y)


def test_to_bin(tmp_path):
    x = synthetic_imagenet(2, size=32)
    p = str(tmp_path / "x.bin")
    to_bin(x, p)
    back = np.fromfile(p, np.float32).reshape(x.shape)
    np.testing.assert_array_equal(back, x)


def test_load_mnist_fallback_and_bin(tmp_path):
    """load_mnist: synthetic fallback when .bin files are absent; real
    contract round-trip when present (same files the reference ladder uses)."""
    import numpy as np

    from dlq_tpu.data.mnist import load_mnist, save_mnist_bin

    (Xtr, Ytr), (Xte, Yte), synth = load_mnist(str(tmp_path / "none"),
                                               train_n=256, test_n=64)
    assert synth and Xtr.shape == (256, 784) and Yte.shape == (64,)

    save_mnist_bin(str(tmp_path / "d"), Xtr, Ytr, "train")
    save_mnist_bin(str(tmp_path / "d"), Xte, Yte, "test")
    (X2, Y2), (X3, Y3), synth2 = load_mnist(str(tmp_path / "d"))
    assert not synth2
    np.testing.assert_array_equal(X2, Xtr)
    np.testing.assert_array_equal(Y3, Yte)

"""Fused dequant+matmul Pallas kernel tests (interpret mode on CPU; the
same kernels compile for TPU — bench/roofline.py measures them there)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.ops.pallas_matmul import int4_matmul, int8_matmul
from dlq_tpu.quant.quantize import pack_int4


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(0)
    M, K, N = 256, 512, 256
    return rng, M, K, N


def test_int8_matmul_exact(data):
    rng, M, K, N = data
    x = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, N)).astype(np.int8)
    scale = (rng.random(N) * 0.01).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    y = int8_matmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                    jnp.asarray(bias), interpret=True)
    ref = x.astype(np.int64) @ w.astype(np.int64) * scale + bias
    # int32 accumulation is exact; only the fp32 epilogue rounds
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 1e-6


def test_int8_matmul_relu_epilogue(data):
    rng, M, K, N = data
    x = rng.integers(-5, 6, (M, K)).astype(np.int8)
    w = rng.integers(-5, 6, (K, N)).astype(np.int8)
    scale = np.full(N, 0.1, np.float32)
    y = int8_matmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                    None, fuse_relu=True, interpret=True)
    assert float(jnp.min(y)) >= 0.0
    ref = np.maximum(x.astype(np.int64) @ w.astype(np.int64) * scale, 0)
    assert np.allclose(np.asarray(y), ref, rtol=1e-5, atol=1e-5)


def test_int8_matmul_multi_k_tiles(data):
    """K spans multiple tiles -> exercises scratch accumulation across steps."""
    rng, _, _, _ = data
    M, K, N = 128, 2048, 128
    x = rng.integers(-127, 128, (M, K)).astype(np.int8)
    w = rng.integers(-127, 128, (K, N)).astype(np.int8)
    scale = np.ones(N, np.float32)
    y = int8_matmul(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                    None, tk=512, interpret=True)
    ref = x.astype(np.int64) @ w.astype(np.int64)
    assert np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max() < 1e-6


def test_int4_matmul_groupwise(data):
    rng, M, K, N = data
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    g = 128
    scales = (rng.random((K // g, N)) * 0.05 + 0.01).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    y = int4_matmul(jnp.asarray(x), packed, jnp.asarray(scales),
                    jnp.asarray(bias), group=g, interpret=True)
    wf = q.astype(np.float32) * np.repeat(scales, g, axis=0)
    ref = x @ wf + bias
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 0.01  # bf16 matmul precision


def test_int4a8_matmul_exact(data):
    """W4A8 kernel: int4 weights unpacked to int8 in-register + int8 MXU
    dots — int32 accumulation is exact, only the fp32 epilogue rounds."""
    from dlq_tpu.ops.pallas_matmul import int4a8_matmul

    rng, M, K, N = data
    x = rng.integers(-127, 128, (M, K)).astype(np.int8)
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    scale = (rng.random(N) * 0.01).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    y = int4a8_matmul(jnp.asarray(x), packed, jnp.asarray(scale),
                      jnp.asarray(bias), tk=K, interpret=True)
    ref = x.astype(np.int64) @ q.astype(np.int64) * scale + bias
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 1e-6
    yr = int4a8_matmul(jnp.asarray(x), packed, jnp.asarray(scale),
                       jnp.asarray(bias), fuse_relu=True, tk=K, interpret=True)
    np.testing.assert_allclose(np.asarray(yr), np.maximum(np.asarray(y), 0.0))


def test_qdense_w4a8_routes_and_matches_int_oracle(data):
    """qdense with int4 per-OC weights + act scale = W4A8: must equal the
    exact integer oracle (unpack -> int8 dot) bit-for-bit up to the fp32
    epilogue."""
    from dlq_tpu.ops.qops import qdense
    from dlq_tpu.quant.qconfig import QScheme
    from dlq_tpu.quant.quantize import quantize_act, quantize_tensor, unpack_int4

    rng, M, K, N = data
    w = rng.normal(0, 1, (K, N)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), QScheme(4, True, -1))
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    act_scale = jnp.float32(np.abs(x).max() / 127.0)
    y = np.asarray(qdense(jnp.asarray(x), qt, None, act_scale))
    xq = np.asarray(quantize_act(jnp.asarray(x), act_scale)).astype(np.int64)
    w8 = np.asarray(unpack_int4(qt.values, qt.shape)).astype(np.int64)
    ref = (xq @ w8).astype(np.float64) * np.asarray(act_scale * qt.scale,
                                                    np.float64)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-6


def test_int4_cached_kernels_match(data):
    """k-cached-unpack variants (grid (j,i,k), K-spanning weight scratch)
    must match the uncached kernels: int4a8 exactly (int paths), W4A16 to
    bf16 precision."""
    from dlq_tpu.ops.pallas_matmul import (
        int4_matmul_cached, int4a8_matmul, int4a8_matmul_cached,
    )

    rng, M, K, N = data
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)).astype(np.int8))
    scale = jnp.asarray((rng.random(N) * 0.01).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 1, N).astype(np.float32))
    y0 = np.asarray(int4a8_matmul(x8, packed, scale, bias, tm=128, tn=128,
                                  tk=256, interpret=True))
    y1 = np.asarray(int4a8_matmul_cached(x8, packed, scale, bias, tm=128,
                                         tn=128, tk=256, interpret=True))
    np.testing.assert_array_equal(y0, y1)

    g = 128
    gs = jnp.asarray((rng.random((K // g, N)) * 0.05 + 0.01).astype(np.float32))
    xf = jnp.asarray(rng.normal(0, 1, (M, K)).astype(np.float32))
    yc = np.asarray(int4_matmul_cached(xf, packed, gs, bias, group=g, tm=128,
                                       tn=128, interpret=True))
    wf = q.astype(np.float32) * np.repeat(np.asarray(gs), g, axis=0)
    ref = np.asarray(xf) @ wf + np.asarray(bias)
    rel = np.abs(yc - ref).max() / np.abs(ref).max()
    assert rel < 0.01


def test_mlp_w4a8_pipeline():
    """INT4A8_PER_CHANNEL through the standard calibrate->quantize->deploy
    pipeline on the MLP (dense-only family the scheme targets)."""
    import jax

    from dlq_tpu import numerics
    from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, mlp_forward, qforward
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    flat = flatten_params(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (64, 784)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x],
                       INT4A8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT4A8_PER_CHANNEL)
    assert all(p["qw"].bits == 4 and p["qw"].group is None
               for p in qflat.values())
    y = np.asarray(qforward(DeployCtx(qflat, scales, INT4A8_PER_CHANNEL),
                            x, cfg))
    yf = np.asarray(mlp_forward(params, x, cfg))
    assert numerics.diff(y, yf).cosine > 0.99  # int4 per-OC accuracy class


def test_int4_matmul_xla2_matches_fused(data):
    """Two-pass XLA dequant variant must match the fused kernel's numerics
    (same split contraction, same bf16 scaled weights)."""
    from dlq_tpu.ops.pallas_matmul import int4_matmul_auto, int4_matmul_xla2

    rng, M, K, N = data
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    g = 128
    scales = (rng.random((K // g, N)) * 0.05 + 0.01).astype(np.float32)
    bias = rng.normal(0, 1, N).astype(np.float32)
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    y2 = int4_matmul_xla2(jnp.asarray(x), packed, jnp.asarray(scales),
                          jnp.asarray(bias), group=g)
    wf = q.astype(np.float32) * np.repeat(scales, g, axis=0)
    ref = x @ wf + bias
    rel = np.abs(np.asarray(y2, np.float64) - ref).max() / np.abs(ref).max()
    assert rel < 0.01  # bf16 matmul precision
    # routing: small M -> fused kernel, large M -> xla2 (same numerics here)
    ya = int4_matmul_auto(jnp.asarray(x), packed, jnp.asarray(scales),
                          jnp.asarray(bias), group=g, m_threshold=M,
                          interpret=True)
    rel2 = np.abs(np.asarray(ya, np.float64) - np.asarray(y2, np.float64)).max()
    assert rel2 / np.abs(ref).max() < 0.01


def test_int4_matmul_vs_qdense_oracle(data):
    """Kernel must agree with the XLA weight-only path on the same QTensor."""
    from dlq_tpu.quant import QScheme, quantize_tensor
    from dlq_tpu.quant.quantize import dequantize

    rng, _, _, _ = data
    M, K, N = 128, 256, 128
    w = rng.normal(0, 1, (K, N)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w), QScheme(4, True, -1, group=128))
    x = rng.normal(0, 1, (M, K)).astype(np.float32)
    y_kernel = int4_matmul(jnp.asarray(x), qt.values, qt.scale, None,
                           group=128, tk=128, interpret=True)
    y_oracle = x @ np.asarray(dequantize(qt))
    rel = np.abs(np.asarray(y_kernel, np.float64) - y_oracle).max() / np.abs(y_oracle).max()
    assert rel < 0.01


def test_tile_halving_guards_odd_shapes():
    """The round-5 large-tk defaults degrade gracefully when a dimension
    does not divide the default tile (halving guards): exactness must hold
    at shapes like K=1536/2560 and M=192 where the old asserts would have
    fired with the new defaults."""
    rng = np.random.default_rng(3)
    for M, K, N in ((192, 1536, 256), (128, 2560, 128), (64, 384, 128)):
        x8 = rng.integers(-127, 128, (M, K)).astype(np.int8)
        w8 = rng.integers(-127, 128, (K, N)).astype(np.int8)
        sc = (rng.random(N) * 0.01).astype(np.float32)
        y = np.asarray(int8_matmul(jnp.asarray(x8), jnp.asarray(w8),
                                   jnp.asarray(sc), interpret=True),
                       np.float64)
        ref = x8.astype(np.int64) @ w8.astype(np.int64) * sc
        assert np.abs(y - ref).max() / np.abs(ref).max() < 1e-6, (M, K, N)

        # W4A8: packed weights, same guard path
        from dlq_tpu.ops.pallas_matmul import int4a8_matmul
        from dlq_tpu.quant.quantize import pack_int4 as _p4

        w4 = rng.integers(-8, 8, (K, N)).astype(np.int8)
        packed = np.asarray(_p4(jnp.asarray(w4)))
        y4 = np.asarray(int4a8_matmul(jnp.asarray(x8), jnp.asarray(packed),
                                      jnp.asarray(sc), interpret=True),
                        np.float64)
        ref4 = x8.astype(np.int64) @ w4.astype(np.int64) * sc
        assert np.abs(y4 - ref4).max() / np.abs(ref4).max() < 1e-6, (M, K, N)

    # W4A16 group-wise with the tk guard honoring the group multiple
    for M, K, N in ((128, 1536, 128), (64, 2560, 256)):
        xb = rng.normal(0, 1, (M, K)).astype(np.float32)
        w4 = rng.integers(-8, 8, (K, N)).astype(np.int8)
        packed = np.asarray(pack_int4(jnp.asarray(w4)))
        scales = (rng.random((K // 128, N)) * 0.02 + 0.01).astype(np.float32)
        y = np.asarray(int4_matmul(jnp.asarray(xb), jnp.asarray(packed),
                                   jnp.asarray(scales), group=128,
                                   interpret=True), np.float64)
        sh = np.repeat(scales, 128, axis=0)
        ref = xb.astype(np.float64) @ (w4 * sh).astype(np.float64)
        rel = np.abs(y - ref).max() / np.abs(ref).max()
        assert rel < 2e-2, (M, K, N, rel)  # bf16 activation rounding

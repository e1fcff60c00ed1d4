"""Implicit-GEMM int8 conv kernel tests (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.ops.pallas_conv import int8_conv3x3_s1


def _ref_conv(x, w, scale, bias, relu):
    acc = jax.lax.conv_general_dilated(
        jnp.asarray(x, jnp.int32), jnp.asarray(w, jnp.int32), (1, 1),
        [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = np.asarray(acc, np.float64) * scale + (bias if bias is not None else 0)
    return np.maximum(y, 0) if relu else y


@pytest.mark.parametrize("shape", [
    (4, 14, 14, 128, 128),   # layer3-ish (batched-M tiling)
    (2, 56, 56, 64, 64),     # layer1 (row tiling)
    (1, 7, 7, 256, 512),     # layer4-ish channel growth
])
def test_conv3x3_matches_xla(shape):
    N, H, W, C, OC = shape
    rng = np.random.default_rng(0)
    x = rng.integers(-50, 50, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-50, 50, (3, 3, C, OC)).astype(np.int8)
    scale = (rng.random(OC) * 0.01).astype(np.float32)
    bias = rng.normal(0, 1, OC).astype(np.float32)
    y = int8_conv3x3_s1(jnp.asarray(x), jnp.asarray(w), jnp.asarray(scale),
                        jnp.asarray(bias), fuse_relu=True, interpret=True)
    ref = _ref_conv(x, w, scale, bias, relu=True)
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-6


def test_conv3x3_no_bias_no_relu():
    rng = np.random.default_rng(1)
    x = rng.integers(-10, 10, (2, 8, 8, 128)).astype(np.int8)
    w = rng.integers(-10, 10, (3, 3, 128, 128)).astype(np.int8)
    y = int8_conv3x3_s1(jnp.asarray(x), jnp.asarray(w),
                        jnp.ones((128,), jnp.float32), None, interpret=True)
    ref = _ref_conv(x, w, np.ones(128), None, relu=False)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=0, atol=0)


def test_pallas_deploy_ctx_matches_xla_deploy():
    """PallasDeployCtx (custom kernels for 3x3s1/1x1 convs + dense) must be
    bit-exact vs DeployCtx on a small quantized ResNet."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        DeployCtx, PallasDeployCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg = ResNetConfig(depth=18, num_classes=16, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    ref = np.asarray(qforward(DeployCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    pal = np.asarray(qforward(PallasDeployCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    np.testing.assert_allclose(pal, ref, rtol=0, atol=1e-5)


# ---------------- dual-pixel packed conv (layer1 shape class) ----------------

@pytest.mark.parametrize("shape,tiles", [
    ((2, 56, 56, 64, 64), None),     # ResNet layer1
    ((4, 8, 8, 64, 64), (2, 8)),     # tiny, explicit tiles + TB > 1
    ((1, 32, 32, 64, 64), None),     # small-input stem class
])
def test_conv3x3_dual_pixel_matches_xla(shape, tiles):
    """The dual-pixel packed kernel (pixel pairs in lanes: K=128, N=128
    full MXU tiles) must be BIT-exact vs XLA's int conv + f32 epilogue."""
    from dlq_tpu.ops.pallas_conv import int8_conv3x3_s1_dp, pack_w_dual

    N, H, W, C, OC = shape
    rng = np.random.default_rng(2)
    x = rng.integers(-50, 50, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-50, 50, (3, 3, C, OC)).astype(np.int8)
    scale = (rng.random(OC) * 0.01).astype(np.float32)
    bias = rng.normal(0, 1, OC).astype(np.float32)
    w6 = jnp.asarray(pack_w_dual(w))
    y = int8_conv3x3_s1_dp(jnp.asarray(x), w6, jnp.asarray(scale),
                           jnp.asarray(bias), fuse_relu=True,
                           interpret=True, tiles=tiles)
    ref = _ref_conv(x, w, scale, bias, relu=True)
    rel = np.abs(np.asarray(y, np.float64) - ref).max() / (np.abs(ref).max() + 1e-9)
    assert rel < 1e-6, rel


def test_conv3x3_dual_pixel_int8_out():
    """int8-requant epilogue (the FullFusedCtx interchange contract):
    q = clip(round((acc*scale + b) / s_out), 0, 127) with relu folded."""
    from dlq_tpu.ops.pallas_conv import int8_conv3x3_s1_dp, pack_w_dual

    N, H, W, C, OC = 2, 16, 16, 64, 64
    rng = np.random.default_rng(3)
    x = rng.integers(-50, 50, (N, H, W, C)).astype(np.int8)
    w = rng.integers(-50, 50, (3, 3, C, OC)).astype(np.int8)
    scale = (rng.random(OC) * 0.01).astype(np.float32)
    bias = rng.normal(0, 1, OC).astype(np.float32)
    s_out = np.float32(0.37)
    w6 = jnp.asarray(pack_w_dual(w))
    q = int8_conv3x3_s1_dp(jnp.asarray(x), w6, jnp.asarray(scale),
                           jnp.asarray(bias), out_scale=jnp.float32(s_out),
                           fuse_relu=True, out_int8=True, interpret=True)
    assert q.dtype == jnp.int8
    y = _ref_conv(x, w, scale, bias, relu=True)
    # reference requant (round-half-even like jnp.round)
    ref_q = np.clip(np.round(np.float32(y) * (1.0 / s_out)), 0, 127).astype(np.int8)
    mismatch = np.mean(np.asarray(q) != ref_q)
    # float32-vs-float64 epilogue ties may flip a ULP-edge row or two
    assert mismatch < 1e-3, mismatch


def test_fullfused_dp_conv_bit_exact():
    """FullFusedCtx(dp_conv=True) routes layer1's C=OC=64 3x3/s1 convs
    through the dual-pixel kernel; the fully-int8 interchange must be
    BIT-identical to the XLA-conv path (same int32 accum, same epilogue)."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg = ResNetConfig(depth=18, num_classes=16, small_input=False)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)

    ref = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    out = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL, dp_conv=True), x, cfg))
    np.testing.assert_array_equal(out, ref)

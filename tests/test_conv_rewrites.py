"""Exact XLA-level conv rewrites for sub-roofline shape classes (round 3).

stage_roofline measured XLA's int8 conv at 39.8% of peak on the layer1
3x3/s1 C=OC=64 class, 24% on the 56-square 3x3/s2, and 7-27% on the 1x1/s2
downsamples. The rewrites re-lay the SAME sums onto full-lane convs/matmuls
(zero-padded taps), so they must be BIT-exact against the direct lowering —
that is the whole contract; speed is measured on TPU (bench_round3.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.ops.qops import (
    conv_int8_down_mm, conv_int8_dpx, conv_int8_s2d, pack_w_dual_xla,
    pack_w_s2d,
)


def _direct(x, w, stride, pad):
    return jax.lax.conv_general_dilated(
        x, w, stride, pad, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32)


@pytest.mark.parametrize("H,W", [(8, 56), (56, 56), (10, 12)])
def test_dpx_exact(H, W):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (2, H, W, 64)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 64, 64)), jnp.int8)
    ref = _direct(x, w, (1, 1), [(1, 1), (1, 1)])
    got = conv_int8_dpx(x, pack_w_dual_xla(w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("C,OC,H", [(64, 128, 56), (128, 256, 28), (16, 32, 8)])
def test_s2d_exact(C, OC, H):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.integers(-127, 128, (2, H, H, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, C, OC)), jnp.int8)
    ref = _direct(x, w, (2, 2), [(1, 1), (1, 1)])
    got = conv_int8_s2d(x, pack_w_s2d(w))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


@pytest.mark.parametrize("C,OC,H", [(64, 128, 56), (256, 512, 14)])
def test_down_mm_exact(C, OC, H):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.integers(-127, 128, (2, H, H, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (1, 1, C, OC)), jnp.int8)
    ref = _direct(x, w, (2, 2), [(0, 0), (0, 0)])
    got = conv_int8_down_mm(x, w.reshape(C, OC))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused2_rewrites_model_exact():
    """All three rewrites through the production fused2 forward: bit-exact
    vs the plain path (same requant decisions on identical int32 accs)."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    rng = np.random.default_rng(3)
    cfg = ResNetConfig(depth=18, num_classes=8)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(rng.normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x],
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    a = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    b = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL,
                     rewrites=("dpx", "s2d", "down_mm")), x, cfg))
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("C,OC,H", [(512, 128, 7), (256, 1024, 14), (64, 64, 9)])
def test_mm1x1_exact(C, OC, H):
    """1x1/s1 conv == int8 matmul on the flattened spatial view (odd H/W
    included — stage4 runs at 7x7)."""
    from dlq_tpu.ops.qops import conv_int8_mm1x1

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.integers(-127, 128, (2, H, H, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (1, 1, C, OC)), jnp.int8)
    ref = _direct(x, w, (1, 1), [(0, 0), (0, 0)])
    got = conv_int8_mm1x1(x, w.reshape(C, OC))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_fused2_mm1x1_bottleneck_model_exact():
    """mm1x1 through the production fused2 forward on a BOTTLENECK resnet
    (1x1/s1 body convs are the target class): bit-exact vs the plain path."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    rng = np.random.default_rng(5)
    cfg = ResNetConfig(depth=50, num_classes=8, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x],
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    a = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    b = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT8_PER_CHANNEL,
                     rewrites=("mm1x1",)), x, cfg))
    np.testing.assert_array_equal(a, b)


def test_deploy_mm1x1_mnv2_exact():
    """mm1x1 through the production DeployCtx on MobileNetV2 (its body is
    mostly 1x1/s1 convs): bit-exact vs the direct-conv path, int8 and
    unpacked-int4 weights both."""
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        DeployCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL

    rng = np.random.default_rng(6)
    cfg = MobileNetV2Config(num_classes=8, small_input=True, width_mult=0.5)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    for qcfg in (INT8_PER_CHANNEL, INT4A8_PER_CHANNEL):
        scales = calibrate(make_sites_fn(qf, cfg), flat, [x], qcfg)
        qflat = quantize_weights(flat, qcfg)
        a = np.asarray(qf(DeployCtx(qflat, scales, qcfg, rewrites=()), x, cfg))
        b = np.asarray(qf(DeployCtx(qflat, scales, qcfg,
                                    rewrites=("mm1x1",)), x, cfg))
        np.testing.assert_array_equal(a, b)


def test_fused2_mm1x1_w4a8_bottleneck_exact():
    """mm1x1 through fused2 with INT4A8 weights (nibble-packed, unpacked
    in-graph to int8): bit-exact vs the plain path on a bottleneck resnet."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    rng = np.random.default_rng(7)
    cfg = ResNetConfig(depth=50, num_classes=8, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x],
                       INT4A8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT4A8_PER_CHANNEL)
    a = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT4A8_PER_CHANNEL, rewrites=()), x, cfg))
    b = np.asarray(qforward_fused2(
        FullFusedCtx(qflat, scales, INT4A8_PER_CHANNEL,
                     rewrites=("mm1x1",)), x, cfg))
    np.testing.assert_array_equal(a, b)

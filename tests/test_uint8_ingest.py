"""uint8 image ingest: preprocessing (mean/std normalize) folded into the
deployed stem. The engine consumes raw uint8 NHWC; must match running the
fp32 normalize pipeline then the fp32-input deploy path."""

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    qforward_fused2,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import (
    FullFusedCtx, make_sites_fn, quantize_weights,
)
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL


def test_uint8_ingest_matches_normalized_fp32():
    cfg = ResNetConfig(depth=18, num_classes=16)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    xn = ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
          / IMAGENET_STD).astype(np.float32)
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat,
                       [jnp.asarray(xn)], qcfg)
    qflat = quantize_weights(flat, qcfg)
    ctx = FullFusedCtx(qflat, scales, qcfg)
    ref = np.asarray(qforward_fused2(ctx, jnp.asarray(xn), cfg))
    got = np.asarray(qforward_fused2(ctx, jnp.asarray(u8), cfg))
    # bf16 fold noise only (same bf16 stem on both paths, different
    # normalize arithmetic order)
    assert numerics.diff(got, ref).cosine > 0.999
    assert numerics.top1_agreement(got, ref) == 1.0


def test_uint8_stem_exactness_vs_fp32_conv():
    """The folded stem on uint8 equals conv(normalize(u)) up to bf16."""
    from dlq_tpu.models.common import conv2d

    cfg = ResNetConfig(depth=18, num_classes=16)
    params = init_resnet(jax.random.PRNGKey(1), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(1)
    u8 = rng.integers(0, 256, (2, 64, 64, 3)).astype(np.uint8)
    xn = ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN)
          / IMAGENET_STD).astype(np.float32)
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat,
                       [jnp.asarray(xn)], qcfg)
    qflat = quantize_weights(flat, qcfg)
    ctx = FullFusedCtx(qflat, scales, qcfg)
    a = ctx.conv_stem_bf16("stem", jnp.asarray(xn), out_site="layer1.0.conv1")
    b = ctx.conv_stem_bf16_u8("stem", jnp.asarray(u8), out_site="layer1.0.conv1")
    # both paths round through bf16 in different orders (xn cast vs folded
    # weights); differences are confined to 1-LSB flips at requant
    # boundaries (~4% of elements measured)
    agree = float((np.asarray(a.q) == np.asarray(b.q)).mean())
    assert agree > 0.93, agree
    assert int(np.abs(np.asarray(a.q, np.int32)
                      - np.asarray(b.q, np.int32)).max()) <= 1

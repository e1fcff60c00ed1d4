"""Fused Pallas residual-block kernels (ops/pallas_block.py) vs the
FullFusedCtx XLA composition. Runs in interpret mode on CPU; the same
kernels compile on TPU (patterns probed by tools/probe_block_patterns.py).

The only permitted deviation is fp32 reassociation of the folded epilogue
scales, which can flip values sitting exactly on a rounding boundary —
gated here as >= 99.9% elementwise agreement and top-1 agreement 1.0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu import numerics
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    qforward_fused2,
)
from dlq_tpu.ops.pallas_block import (
    basic_block_fused, bottleneck_block_fused, pack_basic_block,
    pack_bottleneck_block, pack_fused_blocks,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import (
    FullFusedCtx, PallasBlockCtx, QAct, make_sites_fn, quantize_weights,
)
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
from dlq_tpu.quant.quantize import quantize_act


def _quantize(cfg, key=0, batch=2, size=32):
    params = init_resnet(jax.random.PRNGKey(key), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(key)
    x = jnp.asarray(rng.normal(0, 1, (batch, size, size, 3)), jnp.float32)
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    return qflat, scales, qcfg, x


def _ctx_block_ref(ctx, site, y, nxt):
    """The FullFusedCtx composition for one identity BasicBlock."""
    z = ctx.conv(f"{site}.conv1", y, stride=1, padding=1, fuse_relu=True,
                 out_site=f"{site}.conv2")
    z = ctx.conv(f"{site}.conv2", z, stride=1, padding=1, out_site=nxt)
    sc = ctx.requant(y, nxt)
    return ctx.add_relu(z, sc)


def test_basic_block_matches_composition():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    qflat, scales, qcfg, x = _quantize(cfg)
    ctx = FullFusedCtx(qflat, scales, qcfg)
    site, nxt = "layer1.0", "layer1.1.conv1"
    y = ctx.conv("stem", x, stride=1, padding=1, fuse_relu=True, out_site=f"{site}.conv1")
    ref = _ctx_block_ref(ctx, site, y, nxt)
    pack = pack_basic_block(qflat, scales, site, nxt)
    got = basic_block_fused(y.q, pack, interpret=True)
    agree = float((np.asarray(got) == np.asarray(ref.q)).mean())
    assert agree >= 0.999, agree
    assert int(np.abs(np.asarray(got, np.int32)
                      - np.asarray(ref.q, np.int32)).max()) <= 1


def test_basic_block_channel_pad_64():
    """C=64 < 128 lane padding path (resnet18 layer1 geometry)."""
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    qflat, scales, qcfg, x = _quantize(cfg, key=1, batch=3, size=16)
    ctx = FullFusedCtx(qflat, scales, qcfg)
    site, nxt = "layer1.1", "layer2.0.conv1"
    s_in = scales[f"{site}.conv1"]
    rng = np.random.default_rng(5)
    yq = jnp.asarray(rng.integers(-100, 100, (3, 16, 16, 64)), jnp.int8)
    y = QAct(yq, s_in)
    ref = _ctx_block_ref(ctx, site, y, nxt)
    pack = pack_basic_block(qflat, scales, site, nxt)
    got = basic_block_fused(y.q, pack, interpret=True)
    agree = float((np.asarray(got) == np.asarray(ref.q)).mean())
    assert agree >= 0.999, agree


def test_bottleneck_block_matches_composition():
    cfg = ResNetConfig(depth=50, num_classes=10, small_input=True)
    qflat, scales, qcfg, x = _quantize(cfg, key=2, batch=2, size=16)
    ctx = FullFusedCtx(qflat, scales, qcfg)
    site, nxt = "layer1.1", "layer1.2.conv1"
    s_in = scales[f"{site}.conv1"]
    rng = np.random.default_rng(7)
    yq = jnp.asarray(rng.integers(-100, 100, (2, 16, 16, 256)), jnp.int8)
    y = QAct(yq, s_in)
    z = ctx.conv(f"{site}.conv1", y, fuse_relu=True, out_site=f"{site}.conv2")
    z = ctx.conv(f"{site}.conv2", z, stride=1, padding=1, fuse_relu=True,
                 out_site=f"{site}.conv3")
    z = ctx.conv(f"{site}.conv3", z, out_site=nxt)
    ref = ctx.add_relu(z, ctx.requant(y, nxt))
    pack = pack_bottleneck_block(qflat, scales, site, nxt)
    got = bottleneck_block_fused(y.q, pack, interpret=True)
    agree = float((np.asarray(got) == np.asarray(ref.q)).mean())
    assert agree >= 0.999, agree


@pytest.mark.parametrize("depth", [18, 34, 50])
def test_model_level_pallas_block_ctx(depth):
    """qforward_fused2 under PallasBlockCtx routes identity blocks through
    the fused kernels and matches the FullFusedCtx model end to end."""
    cfg = ResNetConfig(depth=depth, num_classes=10, small_input=True)
    qflat, scales, qcfg, x = _quantize(cfg, key=3, batch=2, size=32)
    ref = np.asarray(qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg))
    packs = pack_fused_blocks(qflat, scales, cfg)
    assert packs, "no identity blocks packed"
    got = np.asarray(qforward_fused2(
        PallasBlockCtx(qflat, scales, qcfg, packs), x, cfg))
    assert numerics.diff(got, ref).cosine > 0.999
    assert numerics.top1_agreement(got, ref) == 1.0


def test_pack_fused_blocks_site_selection():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    qflat, scales, qcfg, x = _quantize(cfg, key=4, batch=2, size=16)
    packs = pack_fused_blocks(qflat, scales, cfg)
    # resnet18: layer1 (C=64) excluded (64-lane interchange unsupported on
    # the backend); l2.1/l3.1 identity; l4.1 junction is the fp32 tail
    # (nxt=None) -> excluded
    assert set(packs) == {"layer2.1", "layer3.1"}
    cfg50 = ResNetConfig(depth=50, num_classes=10, small_input=True)
    qflat50, scales50, _, _ = _quantize(cfg50, key=4, batch=2, size=16)
    packs50 = pack_fused_blocks(qflat50, scales50, cfg50)
    assert len(packs50) == 11  # 12 identity bottlenecks minus the l4 tail
    # bottleneck mid-width padded to >=128 (l1 CM=64 -> 128)
    assert packs50["layer1.1"]["w2"].shape == (3, 3 * 128, 128)

"""Fused whole-transformer-block kernel: parity vs the reference forward."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu import numerics
from dlq_tpu.models.vit import ViTConfig, init_vit, vit_forward
from dlq_tpu.ops.pallas_vit_block import pack_vit_blocks, vit_forward_blockfused


@pytest.fixture(scope="module")
def tiny():
    cfg = ViTConfig(image_size=32, patch=8, dim=96, depth=2, heads=3, num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 32, 32, 3), jnp.float32)
    return cfg, params, x


def test_blockfused_matches_reference(tiny):
    cfg, params, x = tiny
    ref = np.asarray(vit_forward(params, x, dataclasses.replace(cfg, gelu="tanh")))
    out = np.asarray(vit_forward_blockfused(pack_vit_blocks(params, cfg), x, cfg))
    d = numerics.diff(out, ref)
    assert d.cosine > 0.9999
    assert numerics.top1_agreement(out, ref) == 1.0


def test_blockfused_exact_gelu_variant(tiny):
    cfg, params, x = tiny
    ref = np.asarray(vit_forward(params, x, cfg))  # exact gelu oracle
    out = np.asarray(vit_forward_blockfused(
        pack_vit_blocks(params, cfg), x, cfg, gelu_tanh=False))
    assert numerics.diff(out, ref).cosine > 0.9999


def test_blockfused_odd_batch_bt_fallback(tiny):
    cfg, params, x = tiny
    packed = pack_vit_blocks(params, cfg)
    ref = np.asarray(vit_forward_blockfused(packed, x, cfg, bt=4))
    # batch 2 with bt=4 must fall back to a dividing group size, same numbers
    out2 = np.asarray(vit_forward_blockfused(packed, x[:2], cfg, bt=4))
    np.testing.assert_allclose(out2, ref[:2], atol=2e-3)


def test_blockfused_w8_matches_fp32(tiny):
    """W8A8 fused block: quantized deploy accuracy gate (the reference's
    top-1-agreement methodology, SURVEY §4.4)."""
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_blockfused_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg, params, x = tiny
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jax.random.normal(jax.random.PRNGKey(5), (8, 32, 32, 3), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                                scales, vit_extras(params), cfg)
    out = np.asarray(vit_forward_blockfused_w8(packed, x, cfg))
    ref = np.asarray(vit_forward(params, x, dataclasses.replace(cfg, gelu="tanh")))
    d = numerics.diff(out, ref)
    assert d.cosine > 0.999
    assert numerics.top1_agreement(out, ref) == 1.0


def test_blockfused_tight_pads_match_loose(tiny):
    """tight pads (sublane-granule Np, hd-grain Dp) are numerically the
    same model as the 128-multiple pads (measured +13% W8A8 on v5e)."""
    from dlq_tpu.ops.pallas_vit_block import vit_pads

    cfg, params, x = tiny
    Np, Dp = vit_pads(cfg, tight=True)
    assert Np % 8 == 0 and Dp % (cfg.dim // cfg.heads) == 0
    assert (Np, Dp) <= vit_pads(cfg, tight=False)
    ref = np.asarray(vit_forward_blockfused(
        pack_vit_blocks(params, cfg), x, cfg))
    out = np.asarray(vit_forward_blockfused(
        pack_vit_blocks(params, cfg, tight=True), x, cfg, tight=True))
    assert numerics.diff(out, ref).cosine > 0.9999
    assert numerics.top1_agreement(out, ref) == 1.0


def _w8_packed(tiny, tight=True):
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.ops.pallas_vit_block import pack_vit_blocks_w8
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg, params, x = tiny
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch,
                       cfg.dim)
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], INT8_PER_CHANNEL)
    return pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                              scales, vit_extras(params), cfg, tight=tight)


def test_splitattn_bf16_matches_fused(tiny):
    """Split-block with the bf16 XLA attention control arm == the fully
    fused W8A8 block (same math either side of the kernel boundary) — any
    TPU A/B delta then isolates the split cost itself (VERDICT r3 #2)."""
    from dlq_tpu.ops.pallas_vit_block import (
        vit_forward_blockfused_w8, vit_forward_blockfused_w8_split,
    )

    cfg, params, x = tiny
    packed = _w8_packed(tiny)
    ref = np.asarray(vit_forward_blockfused_w8(packed, x, cfg, tight=True))
    out = np.asarray(vit_forward_blockfused_w8_split(
        packed, x, cfg, tight=True, attn="bf16"))
    d = numerics.diff(out, ref)
    assert d.cosine > 0.9999, d
    assert numerics.top1_agreement(out, ref) == 1.0


def test_splitattn_int8_accuracy_gate(tiny):
    """XLA-lowered dynamically-quantized int8 attention: logits must stay
    within the quantized-deploy accuracy envelope of the fp32 oracle."""
    import dataclasses as _dc

    from dlq_tpu.ops.pallas_vit_block import vit_forward_blockfused_w8_split

    cfg, params, x = tiny
    packed = _w8_packed(tiny)
    ref = np.asarray(vit_forward(params, x, _dc.replace(cfg, gelu="tanh")))
    out = np.asarray(vit_forward_blockfused_w8_split(
        packed, x, cfg, tight=True, attn="int8"))
    d = numerics.diff(out, ref)
    assert d.cosine > 0.999, d
    assert numerics.top1_agreement(out, ref) == 1.0


def test_ptq_auto_blockfold_matches_sitewise(tiny):
    """ptq_auto restricted to LN-foldable sites deploys through the fused
    block kernels (smoothing folded into the LN affines at pack time) and
    matches the sitewise SmoothDeployCtx reference on the same payload."""
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4a8, pack_vit_blocks_w8,
        vit_forward_blockfused_w4a8c, vit_forward_blockfused_w8,
    )
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
    from dlq_tpu.quant.recipe import VIT_LN_FOLDABLE, ptq_auto
    from dlq_tpu.quant.smooth import SmoothDeployCtx, compute_smooth

    cfg, params, x = tiny
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [x, jax.random.normal(jax.random.PRNGKey(9), x.shape, jnp.float32)]
    for qcfg, pack, fwd in (
        (INT8_PER_CHANNEL, pack_vit_blocks_w8,
         lambda p, xb: vit_forward_blockfused_w8(p, xb, cfg, tight=True)),
        (INT4A8_PER_CHANNEL, pack_vit_blocks_w4a8,
         lambda p, xb: vit_forward_blockfused_w4a8c(p, xb, cfg, bt=4,
                                                    tight=True)),
    ):
        qa, sa, sm = ptq_auto(qf, flat, cfg, calib, qcfg, smooth="fixed",
                              smooth_site_filter=VIT_LN_FOLDABLE)
        assert sm and all(VIT_LN_FOLDABLE(k) for k in sm), sm
        ref = np.asarray(qf(SmoothDeployCtx(qa, sa, qcfg, sm), x, cfg))
        packed = pack(qa, sa, ex, cfg, tight=True, smooth=sm)
        out = np.asarray(fwd(packed, x))
        d = numerics.diff(out, ref)
        assert d.cosine > 0.999, (qcfg, d)
        assert numerics.top1_agreement(out, ref) == 1.0
    # non-foldable vectors must be refused at pack time, not silently lost
    bad = {"l0.proj": np.ones((cfg.dim,), np.float32)}
    with pytest.raises(ValueError, match="fold"):
        pack_vit_blocks_w8(quantize_weights_for_test(flat), {}, ex, cfg,
                           smooth=bad)


def quantize_weights_for_test(flat):
    from dlq_tpu.quant.model_quant import quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    return quantize_weights(flat, INT8_PER_CHANNEL)


def test_blockfold_smoothing_wins_on_outlier_channels():
    """When activation outliers live at the LN-foldable sites (planted via
    boosted ln1 gains -> huge qkv-input channels), the LN-folded smoothing
    must beat the unsmoothed block deploy — the restricted-site fold is a
    real accuracy lever, not just a zero-cost no-op."""
    import dataclasses as _dc

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
        vit_forward,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_blockfused_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.quant.recipe import VIT_LN_FOLDABLE, ptq_auto

    cfg = ViTConfig(image_size=32, patch=8, dim=96, depth=2, heads=3,
                    num_classes=10)
    params = init_vit(jax.random.PRNGKey(11), cfg)
    # plant outlier channels at the qkv/fc1 inputs: boost a few LN gains
    for lp in params["layers"]:
        for ln in ("ln1", "ln2"):
            g = np.array(lp[ln]["g"], copy=True)
            g[:8] *= 20.0
            lp[ln]["g"] = jnp.asarray(g)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    rng = np.random.default_rng(11)
    calib = [jnp.asarray(rng.normal(0, 1, (16, 32, 32, 3)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    fp32 = np.asarray(vit_forward(params, x, _dc.replace(cfg, gelu="tanh")))

    # unsmoothed block deploy
    sc = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    pk0 = pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                             sc, ex, cfg, tight=True)
    e0 = numerics.diff(
        np.asarray(vit_forward_blockfused_w8(pk0, x, cfg, tight=True)),
        fp32).rel_l2

    # LN-folded smoothing (fixed alpha so the win is deterministic),
    # GPTQ/bc off to isolate the smoothing effect
    qa, sa, sm = ptq_auto(qf, flat, cfg, calib, INT8_PER_CHANNEL,
                          smooth="fixed", gptq=False, bias_correct=False,
                          smooth_site_filter=VIT_LN_FOLDABLE)
    assert sm, "fixed-alpha smoothing produced no vectors"
    pk1 = pack_vit_blocks_w8(qa, sa, ex, cfg, tight=True, smooth=sm)
    e1 = numerics.diff(
        np.asarray(vit_forward_blockfused_w8(pk1, x, cfg, tight=True)),
        fp32).rel_l2
    assert e1 < e0 * 0.9, (e1, e0)


def test_ptq_auto_blockfold_store_roundtrip():
    """A ptq_auto model with LN-foldable smoothing round-trips through the
    quantized store with FOLDED extras: the artifact is self-contained
    (no smooth field, no SmoothDeployCtx) and deploys the smoothed model
    through both the sitewise ctx and the fused block kernels."""
    import tempfile

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL
    from dlq_tpu.quant.recipe import VIT_LN_FOLDABLE, ptq_auto
    from dlq_tpu.quant.smooth import SmoothDeployCtx, fold_smooth_into_ln_extras
    from dlq_tpu.quant.store import save_quantized

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(6), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    rng = np.random.default_rng(6)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32),
             jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)]
    qa, sa, sm = ptq_auto(qf, flat, cfg, calib, INT4A8_PER_CHANNEL,
                          smooth="fixed", smooth_site_filter=VIT_LN_FOLDABLE)
    assert sm
    x = np.asarray(rng.normal(0, 1, (4, 64, 64, 3)), np.float32)
    ref = np.asarray(qf(SmoothDeployCtx(qa, sa, INT4A8_PER_CHANNEL, sm),
                        jnp.asarray(x), cfg))
    ex_folded = fold_smooth_into_ln_extras(ex, sm)
    meta = {"config": {k: getattr(cfg, k) for k in
                       ("num_classes", "image_size", "patch", "dim",
                        "depth", "heads")}}
    with tempfile.TemporaryDirectory() as td:
        save_quantized(td + "/q", "deit_tiny", qa, sa, INT4A8_PER_CHANNEL,
                       extras=ex_folded, meta=meta)
        # sitewise: folded LN == runtime x/s divide in real arithmetic;
        # the bf16 interchange rounds at a different point (bf16(g/s)·t
        # vs (bf16(g)·t)/s), so the gate is the quantized-deploy envelope
        eng_d = Engine.from_store(td + "/q", ctx="deploy", batch=4)
        out_d = np.asarray(eng_d(x))
        d = numerics.diff(out_d, ref)
        assert d.cosine > 0.999, d
        assert numerics.top1_agreement(out_d, ref) == 1.0
        # block kernels: same smoothed model at full kernel rate
        eng_b = Engine.from_store(td + "/q", ctx="block", batch=4)
        out_b = np.asarray(eng_b(x))
        db = numerics.diff(out_b, ref)
        assert db.cosine > 0.999, db
        assert numerics.top1_agreement(out_b, ref) == 1.0
    # non-foldable vectors must be refused
    with pytest.raises(ValueError, match="fold"):
        fold_smooth_into_ln_extras(ex, {"l0.proj": np.ones(cfg.dim)})


def test_attn_xla_int8_impl_close_to_fp32():
    """Standalone check of ops/int8_attention vs the fp32 attention math on
    head-shaped tensors (per-sample-head scales, masked columns)."""
    from dlq_tpu.models.vit import attention
    from dlq_tpu.ops.int8_attention import attention_int8_dynamic

    rng = np.random.default_rng(0)
    B, N, heads, hd = 3, 24, 2, 16
    q, k, v = (jnp.asarray(rng.normal(0, 1, (B, N, heads * hd)), jnp.float32)
               for _ in range(3))
    ref = np.asarray(attention(q, k, v, heads, impl="xla"))
    out = np.asarray(attention_int8_dynamic(q, k, v, heads))
    d = numerics.diff(out, ref)
    assert d.cosine > 0.999, d
    # masked variant: masked-out key columns must not leak into valid rows
    out_m = np.asarray(attention_int8_dynamic(q, k, v, heads, n_valid=N - 4))
    ref_m = np.asarray(attention(q[:, : N - 4], k[:, : N - 4], v[:, : N - 4],
                                 heads, impl="xla"))
    d_m = numerics.diff(out_m[:, : N - 4], ref_m)
    assert d_m.cosine > 0.999, d_m


def test_multiblock_w8_matches_single(tiny):
    """Stacked multi-layer W8A8 kernel == the per-layer kernel chain (L=1
    bit-exact; L>1 only skips the inter-layer bf16 round-trip)."""
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_blockfused_w8,
        vit_forward_multiblock_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg, params, x = tiny
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch,
                       cfg.dim)
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                                scales, vit_extras(params), cfg, tight=True)
    ref = np.asarray(vit_forward_blockfused_w8(packed, x, cfg, tight=True))
    out1 = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                                layers_per_kernel=1))
    np.testing.assert_array_equal(out1, ref)
    out2 = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                                layers_per_kernel=cfg.depth))
    assert numerics.diff(out2, ref).cosine > 0.999
    assert numerics.top1_agreement(out2, ref) == 1.0


def test_multiblock_softmax_variants(tiny):
    """Optimization softmax modes: sm_recip must be bit-exact (reciprocal
    multiply is the same math); sm_nomax (static shift, multiplicative mask)
    is shift-invariant softmax — near-exact, same top-1."""
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_multiblock_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg, params, x = tiny
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch,
                       cfg.dim)
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                                scales, vit_extras(params), cfg, tight=True)
    base = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                                layers_per_kernel=2))
    recip = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                                 layers_per_kernel=2,
                                                 ablate=("sm_recip",)))
    np.testing.assert_array_equal(recip, base)
    nomax = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                                 layers_per_kernel=2,
                                                 ablate=("sm_nomax",)))
    assert numerics.diff(nomax, base).cosine > 0.9999
    assert numerics.top1_agreement(nomax, base) == 1.0
    # head-stacked attention (one batched dot per scores/AV over heads*Bt):
    # K zero-pad is exact, so bit-identical
    hs = np.asarray(vit_forward_multiblock_w8(packed, x, cfg,
                                              layers_per_kernel=2,
                                              ablate=("attn_headstack",)))
    np.testing.assert_array_equal(hs, base)


def test_pack_shapes_padded(tiny):
    cfg, params, _ = tiny
    packed = pack_vit_blocks(params, cfg)
    N, Np, D, Dp, hd = (int(v) for v in packed["dims"])
    assert (N, D, hd) == (cfg.seq_len, 96, 32)
    assert Np % 128 == 0 and Dp % 128 == 0 and Dp % hd == 0
    b0 = packed["blocks"][0]
    assert b0["wqkv"].shape == (Dp, 3 * Dp) and b0["wqkv"].dtype == jnp.bfloat16
    # padded feature columns must be zero so pad lanes self-propagate
    assert float(jnp.abs(b0["wqkv"][D:, :]).max()) == 0.0
    assert float(jnp.abs(b0["wqkv"][:, D:Dp]).max()) == 0.0


def test_w4_blockfused_matches_weight_only_deploy():
    """W4A16 fused block kernel (int4 weights resident, in-kernel halves
    unpack, per-OC scales on the f32 epilogue) tracks the site-wise
    weight-only deploy oracle; store round-trip through Engine.from_store
    (ctx='block' on a weight-only store) matches the direct forward."""
    import tempfile

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4, vit_forward_blockfused_w4,
    )
    from dlq_tpu.quant.model_quant import DeployCtx, quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_PER_OC
    from dlq_tpu.quant.store import save_quantized

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qcfg = INT4_WEIGHT_ONLY_PER_OC
    qflat = quantize_weights(flat, qcfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)), jnp.float32)

    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    ref = np.asarray(qf(DeployCtx(qflat, None, qcfg), x, cfg))
    packed = pack_vit_blocks_w4(qflat, ex, cfg, tight=True)
    out = np.asarray(vit_forward_blockfused_w4(packed, x, cfg, tight=True))
    assert numerics.diff(out, ref).cosine > 0.999

    with tempfile.TemporaryDirectory() as td:
        save_quantized(td + "/q", "deit_tiny", qflat, None, qcfg, extras=ex,
                       meta={"config": {k: getattr(cfg, k) for k in
                                        ("num_classes", "image_size", "patch",
                                         "dim", "depth", "heads")}})
        eng = Engine.from_store(td + "/q", ctx="block", batch=4)
        got = np.asarray(eng(np.asarray(x)))
        np.testing.assert_allclose(got, out, rtol=0, atol=2e-2)


def test_w4_multiblock_matches_per_layer():
    """Stacked W4 chunks: L=1 must match the per-layer kernel exactly; L=2
    tracks it to in-chunk-f32-residual precision."""
    from dlq_tpu.models.vit import ViTConfig, flatten_vit, init_vit, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4, vit_forward_blockfused_w4,
        vit_forward_multiblock_w4,
    )
    from dlq_tpu.quant.model_quant import quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_PER_OC

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(1), cfg)
    q4 = quantize_weights(flatten_vit(params), INT4_WEIGHT_ONLY_PER_OC)
    packed = pack_vit_blocks_w4(q4, vit_extras(params), cfg, tight=True)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (4, 64, 64, 3)),
                    jnp.float32)
    a = np.asarray(vit_forward_blockfused_w4(packed, x, cfg, tight=True))
    b = np.asarray(vit_forward_multiblock_w4(packed, x, cfg,
                                             layers_per_kernel=1, tight=True))
    c = np.asarray(vit_forward_multiblock_w4(packed, x, cfg,
                                             layers_per_kernel=2, tight=True))
    np.testing.assert_array_equal(b, a)
    assert numerics.diff(c, a).cosine > 0.9999


def test_w4a8_blockfused_matches_deploy():
    """W4A8 fused block (int4 weights, int8 MXU dots): tracks the site-wise
    INT4A8 deploy the way the W8 kernel tracks its deploy ctx."""
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4a8, vit_forward_blockfused_w4a8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(2), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(2)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT4A8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT4A8_PER_CHANNEL)
    x = jnp.asarray(rng.normal(0, 1, (4, 64, 64, 3)), jnp.float32)
    ref = np.asarray(qf(DeployCtx(qflat, scales, INT4A8_PER_CHANNEL), x, cfg))
    packed = pack_vit_blocks_w4a8(qflat, scales, ex, cfg, tight=True)
    out = np.asarray(vit_forward_blockfused_w4a8(packed, x, cfg, tight=True))
    assert numerics.diff(out, ref).cosine > 0.998
    assert numerics.top1_agreement(out, ref) == 1.0


def test_w4a8_from_store_block():
    """INT4A8 deit store + ctx='block' routes to the W4A8 fused kernel."""
    import tempfile

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4a8, vit_forward_blockfused_w4a8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL
    from dlq_tpu.quant.store import save_quantized

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(3), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(3)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT4A8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT4A8_PER_CHANNEL)
    x = np.asarray(rng.normal(0, 1, (4, 64, 64, 3)), np.float32)
    packed = pack_vit_blocks_w4a8(qflat, scales, ex, cfg, tight=True)
    ref = np.asarray(vit_forward_blockfused_w4a8(packed, jnp.asarray(x), cfg,
                                                 tight=True))
    with tempfile.TemporaryDirectory() as td:
        save_quantized(td + "/q", "deit_tiny", qflat, scales,
                       INT4A8_PER_CHANNEL, extras=ex,
                       meta={"config": {k: getattr(cfg, k) for k in
                                        ("num_classes", "image_size", "patch",
                                         "dim", "depth", "heads")}})
        eng = Engine.from_store(td + "/q", ctx="block", batch=4)
        assert eng.name.endswith("block_w4a8")
        np.testing.assert_allclose(np.asarray(eng(x)), ref, rtol=0, atol=2e-2)


def test_block_ctx_routing_guards():
    """from_store ctx='block' routing: int4_runtime='int8' materializes to
    the W8 path (the option's documented purpose); group-wise weight-only
    stores get a clear ctx-level error instead of a packer crash."""
    import tempfile

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT4_WEIGHT_ONLY_G128
    from dlq_tpu.quant.store import save_quantized

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(4), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(4)
    x = np.asarray(rng.normal(0, 1, (4, 64, 64, 3)), np.float32)
    meta = {"config": {k: getattr(cfg, k) for k in
                       ("num_classes", "image_size", "patch", "dim",
                        "depth", "heads")}}

    with tempfile.TemporaryDirectory() as td:
        calib = [jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qf, cfg), flat, calib,
                           INT4A8_PER_CHANNEL)
        q4 = quantize_weights(flat, INT4A8_PER_CHANNEL)
        save_quantized(td + "/i4a8", "deit_tiny", q4, scales,
                       INT4A8_PER_CHANNEL, extras=ex, meta=meta)
        # materialize-at-load routes to the W8 block path and runs
        eng = Engine.from_store(td + "/i4a8", ctx="block",
                                int4_runtime="int8", batch=4)
        assert eng.name == "deit_tiny_block"
        assert np.isfinite(np.asarray(eng(x))).all()

        qg = quantize_weights(flat, INT4_WEIGHT_ONLY_G128)
        save_quantized(td + "/g128", "deit_tiny", qg, None,
                       INT4_WEIGHT_ONLY_G128, extras=ex, meta=meta)
        with pytest.raises(ValueError, match="per-OC int4"):
            Engine.from_store(td + "/g128", ctx="block", batch=4)

        # weight_overrides promoting SOME block sites to int8 on an int4a8
        # base: mixed-width l*.* sites have no fused packer — explicit error
        # (not a per-site packer crash)
        from dataclasses import replace

        from dlq_tpu.quant.qconfig import QScheme

        qmix_cfg = replace(INT4A8_PER_CHANNEL,
                           weight_overrides=(("l*.fc2", QScheme(8, True, -1)),))
        scales_m = calibrate(make_sites_fn(qf, cfg), flat, calib, qmix_cfg)
        qmix = quantize_weights(flat, qmix_cfg)
        save_quantized(td + "/mix", "deit_tiny", qmix, scales_m, qmix_cfg,
                       extras=ex, meta=meta)
        with pytest.raises(ValueError, match="per-channel int8"):
            Engine.from_store(td + "/mix", ctx="block", batch=4)
        # materialize-at-load makes the widths uniform int8 again -> W8 path
        eng8 = Engine.from_store(td + "/mix", ctx="block",
                                 int4_runtime="int8", batch=4)
        assert eng8.name == "deit_tiny_block"
        assert np.isfinite(np.asarray(eng8(x))).all()


def test_w4a8_cached_unpack_bit_identical():
    """The cache-unpack W4A8 kernel (nibbles unpacked once at grid step 0
    into int8 scratches) must be BIT-identical to the per-step-unpack
    kernel across multiple batch groups."""
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4a8, vit_forward_blockfused_w4a8,
        vit_forward_blockfused_w4a8c,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(5), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(5)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT4A8_PER_CHANNEL)
    packed = pack_vit_blocks_w4a8(quantize_weights(flat, INT4A8_PER_CHANNEL),
                                  scales, ex, cfg, tight=True)
    x = jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)
    a = np.asarray(vit_forward_blockfused_w4a8(packed, x, cfg, bt=4, tight=True))
    b = np.asarray(vit_forward_blockfused_w4a8c(packed, x, cfg, bt=4, tight=True))
    np.testing.assert_array_equal(b, a)


def test_w4a16_cached_unpack_bit_identical():
    """Cache-unpack W4A16 kernel == per-step-unpack kernel, and the
    weight-only from_store block engine (which deploys it) still matches."""
    from dlq_tpu.models.vit import ViTConfig, flatten_vit, init_vit, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4, vit_forward_blockfused_w4,
        vit_forward_blockfused_w4c,
    )
    from dlq_tpu.quant.model_quant import quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_PER_OC

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(6), cfg)
    packed = pack_vit_blocks_w4(
        quantize_weights(flatten_vit(params), INT4_WEIGHT_ONLY_PER_OC),
        vit_extras(params), cfg, tight=True)
    x = jnp.asarray(np.random.default_rng(6).normal(0, 1, (8, 64, 64, 3)),
                    jnp.float32)
    a = np.asarray(vit_forward_blockfused_w4(packed, x, cfg, bt=4, tight=True))
    b = np.asarray(vit_forward_blockfused_w4c(packed, x, cfg, bt=4, tight=True))
    np.testing.assert_array_equal(b, a)


def test_gptq_feeds_w4a8_block_kernel():
    """GPTQ-rounded int4 weights are format-identical to RTN QTensors, so
    they pack into the W4A8 fused block kernel unchanged — and track the
    fp32 oracle at least as well as RTN through the SAME kernel."""
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
        vit_forward,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4a8, vit_forward_blockfused_w4a8c,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.gptq import collect_hessians, gptq_quantize_weights
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg = ViTConfig(num_classes=10, image_size=64, patch=16, dim=192,
                    depth=2, heads=3)
    params = init_vit(jax.random.PRNGKey(7), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(7)
    calib = [jnp.asarray(rng.normal(0, 1, (16, 64, 64, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT4A8_PER_CHANNEL)
    col = collect_hessians(qf, flat, cfg, calib)
    x = jnp.asarray(rng.normal(0, 1, (8, 64, 64, 3)), jnp.float32)
    fp32 = np.asarray(vit_forward(params, x, cfg))

    outs = {}
    for how, qflat in (("rtn", quantize_weights(flat, INT4A8_PER_CHANNEL)),
                       ("gptq", gptq_quantize_weights(flat, INT4A8_PER_CHANNEL, col))):
        packed = pack_vit_blocks_w4a8(qflat, scales, ex, cfg, tight=True)
        outs[how] = np.asarray(
            vit_forward_blockfused_w4a8c(packed, x, cfg, tight=True))
    e_rtn = numerics.diff(outs["rtn"], fp32).rel_l2
    e_gptq = numerics.diff(outs["gptq"], fp32).rel_l2
    assert e_gptq <= e_rtn * 1.05, (e_gptq, e_rtn)

"""Fused Pallas attention: parity vs the jnp reference + deit store wiring."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.models.vit import ViTConfig, attention, init_vit, vit_forward
from dlq_tpu.ops.pallas_attention import attention_fused


@pytest.mark.parametrize("B,N,D,h", [(4, 197, 192, 3), (2, 64, 128, 2), (1, 130, 96, 3)])
def test_attention_fused_matches_reference(B, N, D, h):
    q, k, v = (
        jax.random.normal(kk, (B, N, D), jnp.float32)
        for kk in jax.random.split(jax.random.PRNGKey(0), 3)
    )
    ref = attention(q, k, v, h)
    out = attention_fused(q, k, v, h)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5


def test_attention_fused_bf16():
    q, k, v = (
        jax.random.normal(kk, (2, 197, 192), jnp.bfloat16)
        for kk in jax.random.split(jax.random.PRNGKey(1), 3)
    )
    ref = attention(q, k, v, 3).astype(jnp.float32)
    out = attention_fused(q, k, v, 3).astype(jnp.float32)
    cos = float(jnp.sum(ref * out) / jnp.sqrt(jnp.sum(ref**2) * jnp.sum(out**2)))
    assert cos > 0.9999
    assert out.dtype == jnp.float32


def test_vit_forward_fused_impl_matches_xla():
    import dataclasses

    cfg = ViTConfig(image_size=32, patch=8, dim=96, depth=2, heads=3,
                    num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 32, 3), jnp.float32)
    ref = vit_forward(params, x, cfg)
    out = vit_forward(params, x, dataclasses.replace(cfg, attn_impl="fused"))
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-4


def test_engine_from_store_deit(tmp_path):
    """Cold-start a quantized tiny deit from its store (NEXT.md item)."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.quant.store import save_quantized

    cfg = ViTConfig(image_size=32, patch=8, dim=96, depth=2, heads=3, num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jax.random.normal(jax.random.PRNGKey(2), (4, 32, 32, 3), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    save_quantized(
        str(tmp_path / "store"), "deit_tiny", qflat, scales, INT8_PER_CHANNEL,
        extras=vit_extras(params),
        meta={"config": {k: getattr(cfg, k) for k in
                         ("num_classes", "image_size", "patch", "dim", "depth", "heads")}},
    )
    eng = Engine.from_store(str(tmp_path / "store"), batch=4)
    x = np.asarray(jax.random.normal(jax.random.PRNGKey(3), (4, 32, 32, 3)), np.float32)
    logits = np.asarray(eng(x))
    assert logits.shape == (4, 10)
    # must match the in-memory deploy path exactly (same ctx, same scales)
    ref = qf(DeployCtx(qflat, scales, INT8_PER_CHANNEL), jnp.asarray(x), cfg)
    np.testing.assert_allclose(logits, np.asarray(ref, np.float32), rtol=0, atol=2e-2)

    # ctx="block": W8A8 fused whole-block kernel from the same store
    eng_b = Engine.from_store(str(tmp_path / "store"), ctx="block", batch=4)
    lb = np.asarray(eng_b(x))
    from dlq_tpu import numerics
    assert numerics.diff(lb, np.asarray(ref, np.float32)).cosine > 0.999
    assert numerics.top1_agreement(lb, np.asarray(ref, np.float32)) == 1.0

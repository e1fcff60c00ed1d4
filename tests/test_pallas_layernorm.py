"""Fused LayerNorm kernels: parity vs the jnp reference, all dtypes/shapes."""

import dataclasses

import jax
import jax.numpy as jnp
import pytest

from dlq_tpu.models.vit import ViTConfig, init_vit, layernorm, vit_forward
from dlq_tpu.ops.pallas_layernorm import layernorm_fused, residual_layernorm


@pytest.mark.parametrize("D", [192, 256, 100])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_layernorm_fused_parity(D, dtype):
    k = jax.random.split(jax.random.PRNGKey(0), 4)
    x = (jax.random.normal(k[0], (2, 197, D), jnp.float32) * 3 + 1).astype(dtype)
    g = (jax.random.normal(k[1], (D,)) * 0.2 + 1).astype(dtype)
    b = (jax.random.normal(k[2], (D,)) * 0.1).astype(dtype)
    ref = layernorm(x, {"g": g, "b": b}).astype(jnp.float32)
    out = layernorm_fused(x, g, b).astype(jnp.float32)
    tol = 2e-6 if dtype == jnp.float32 else 5e-2
    assert float(jnp.max(jnp.abs(ref - out))) < tol
    assert out.dtype == jnp.float32


def test_residual_layernorm_parity():
    k = jax.random.split(jax.random.PRNGKey(1), 4)
    y = jax.random.normal(k[0], (3, 50, 192), jnp.float32)
    d = jax.random.normal(k[1], (3, 50, 192), jnp.float32)
    g = jax.random.normal(k[2], (192,)) * 0.2 + 1
    b = jax.random.normal(k[3], (192,)) * 0.1
    z, h = residual_layernorm(y, d, g, b)
    assert float(jnp.max(jnp.abs(z - (y + d)))) == 0.0
    ref = layernorm(y + d, {"g": g, "b": b})
    assert float(jnp.max(jnp.abs(h - ref))) < 2e-6


def test_vit_fused_ln_forward_matches_standard():
    cfg = ViTConfig(image_size=64, patch=16, dim=96, depth=3, heads=3, num_classes=10)
    p = init_vit(jax.random.PRNGKey(0), cfg)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 64, 3), jnp.float32)
    ref, tr = vit_forward(p, x, cfg, taps=True)
    out, tf = vit_forward(
        p, x, dataclasses.replace(cfg, fused_ln=True, attn_impl="fused"), taps=True
    )
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5
    assert tr.keys() == tf.keys()
    for key in tr:
        assert float(jnp.max(jnp.abs(tr[key] - tf[key]))) < 1e-5, key

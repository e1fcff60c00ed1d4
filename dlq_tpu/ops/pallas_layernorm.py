"""Pallas TPU fused LayerNorm (+ optional residual add).

Motivation (tools/bench_vit_breakdown.py, TPU v5e, b256 DeiT-Ti): XLA lowers
each pre-LN transformer LayerNorm to ~4 HBM passes over a lane-padded
(192->256) tensor — 24 LNs cost 7.2 ms, a third of the whole forward. This
kernel does moments + normalize in one read and one write (two-moment
single pass: var = E[x^2] - E[x]^2), with the feature dim handled exactly
even when it is not a lane multiple.

residual_layernorm fuses the transformer's `y = y + delta; h = LN(y)`
junction: one read of each input, two writes (the updated residual stream
and the normalized output) — replacing what XLA runs as add + 4-pass LN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _ln_body(x, g, b, eps, d_valid):
    """x: [rows, D] fp32. Returns LN(x)*g+b, exact over d_valid columns."""
    D = x.shape[-1]
    if d_valid != D:
        col = jax.lax.broadcasted_iota(jnp.int32, x.shape, dimension=x.ndim - 1)
        mask = (col < d_valid).astype(jnp.float32)
        x = x * mask  # zero the pad lanes so moments are exact
    inv_n = 1.0 / float(d_valid)
    mu = jnp.sum(x, -1, keepdims=True) * inv_n
    m2 = jnp.sum(x * x, -1, keepdims=True) * inv_n
    var = jnp.maximum(m2 - mu * mu, 0.0)
    # pad lanes: (0 - mu) * rsqrt * g; g/b are zero-padded so output pads = 0
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _ln_kernel(x_ref, g_ref, b_ref, o_ref, *, eps, d_valid):
    y = _ln_body(x_ref[:].astype(jnp.float32), g_ref[:].astype(jnp.float32),
                 b_ref[:].astype(jnp.float32), eps, d_valid)
    o_ref[:] = y.astype(o_ref.dtype)


def _res_ln_kernel(y_ref, d_ref, g_ref, b_ref, z_ref, o_ref, *, eps, d_valid):
    z = y_ref[:].astype(jnp.float32) + d_ref[:].astype(jnp.float32)
    z_ref[:] = z.astype(z_ref.dtype)
    o = _ln_body(z, g_ref[:].astype(jnp.float32), b_ref[:].astype(jnp.float32),
                 eps, d_valid)
    o_ref[:] = o.astype(o_ref.dtype)


def _rows_block(M: int, D: int, itemsize: int, want: int = 1024) -> int:
    """Pick a row-block size: multiple of 8 sublanes, fits comfortably in
    VMEM (few MB across in+out buffers), divides the padded row count."""
    rows = min(want, M)
    rows = max(8, (rows // 8) * 8)
    while M % rows:
        rows -= 8
        if rows <= 8:
            return 8
    return rows


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def layernorm_fused(x: jnp.ndarray, g: jnp.ndarray, b: jnp.ndarray,
                    eps: float = 1e-6, interpret: bool | None = None) -> jnp.ndarray:
    """LN over the last axis of x[..., D] in one HBM read + one write."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = x.shape[:-1]
    D = x.shape[-1]
    x2 = x.reshape(-1, D)
    M = x2.shape[0]
    Mp = _cdiv(M, 8) * 8
    if Mp != M:
        x2 = jnp.pad(x2, ((0, Mp - M), (0, 0)))
    rows = _rows_block(Mp, D, x2.dtype.itemsize)
    g2 = g.reshape(1, D)
    b2 = b.reshape(1, D)
    out = pl.pallas_call(
        functools.partial(_ln_kernel, eps=eps, d_valid=D),
        grid=(Mp // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Mp, D), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(x2, g2, b2)
    return out[:M].reshape(lead + (D,))


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def residual_layernorm(y: jnp.ndarray, delta: jnp.ndarray, g: jnp.ndarray,
                       b: jnp.ndarray, eps: float = 1e-6,
                       interpret: bool | None = None):
    """(z, h) = (y + delta, LN(y + delta) * g + b) in one fused pass."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lead = y.shape[:-1]
    D = y.shape[-1]
    y2 = y.reshape(-1, D)
    d2 = delta.reshape(-1, D)
    M = y2.shape[0]
    Mp = _cdiv(M, 8) * 8
    if Mp != M:
        y2 = jnp.pad(y2, ((0, Mp - M), (0, 0)))
        d2 = jnp.pad(d2, ((0, Mp - M), (0, 0)))
    rows = _rows_block(Mp, D, y2.dtype.itemsize)
    g2 = g.reshape(1, D)
    b2 = b.reshape(1, D)
    z, h = pl.pallas_call(
        functools.partial(_res_ln_kernel, eps=eps, d_valid=D),
        grid=(Mp // rows,),
        in_specs=[
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, D), y.dtype),
            jax.ShapeDtypeStruct((Mp, D), y.dtype),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(y2, d2, g2, b2)
    return z[:M].reshape(lead + (D,)), h[:M].reshape(lead + (D,))

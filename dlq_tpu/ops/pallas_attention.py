"""Pallas TPU fused multi-head self-attention (non-causal, short-seq).

Motivation (BENCH_NOTES / NEXT.md): DeiT-Ti at dim 192 / seq 197 is
attention- and elementwise-bound. The unfused jnp attention materializes the
scores tensor [B, h, N, N] in HBM (b256: 119 MB fp32 *per layer*) and round-
trips it through softmax — ~7 ms of the 22 ms fp32 forward at batch 256.
This kernel keeps the whole softmax(QK^T/sqrt(d))V for a group of heads in
VMEM: scores never touch HBM.

Shape regime: short sequences (N_pad <= ~1024) where a full [N, N] score
tile fits VMEM — ViT/DeiT territory (197 -> pad 256). Not a paged/causal
flash kernel; no masking is needed beyond the right-edge padding mask.

Reference analogue: the closest thing the reference has is its fused
softmax kernel (`CUDA/resnet18-kernel-lab/cpp/fp32/kernels/softmax.cu:6-47`,
single-block max/exp/sum) — this is that idea extended to the whole
attention epilogue, TPU-style (grid over head-groups, MXU matmuls, VPU
softmax, fp32 accumulation).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _mhsa_kernel(q_ref, kt_ref, v_ref, o_ref, *, n_valid, scale, out_dtype):
    """One grid step = G heads. Blocks: q/v [G, Np, hd], kt [G, hd, Np]."""
    G, Np, hd = q_ref.shape
    # right-edge padding mask: keys >= n_valid are padding -> -inf scores
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), dimension=1)
    neg = jnp.float32(-1e30)

    def one_head(g, _):
        q = q_ref[g]            # [Np, hd]
        kt = kt_ref[g]          # [hd, Np]
        s = jax.lax.dot(q, kt, preferred_element_type=jnp.float32)
        s = s * scale
        if n_valid != Np:
            s = jnp.where(col < n_valid, s, neg)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        attn = (p / denom).astype(v_ref.dtype)
        o = jax.lax.dot(attn, v_ref[g], preferred_element_type=jnp.float32)
        o_ref[g] = o.astype(out_dtype)
        return 0

    jax.lax.fori_loop(0, G, one_head, 0, unroll=True)


@functools.partial(jax.jit, static_argnames=("n_valid", "group", "interpret"))
def fused_mhsa(
    q: jnp.ndarray,   # [BH, Np, hd]
    kt: jnp.ndarray,  # [BH, hd, Np]  (K pre-transposed: contraction on MXU lanes)
    v: jnp.ndarray,   # [BH, Np, hd]
    n_valid: int,
    group: int = 16,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """softmax(q @ kt / sqrt(hd)) @ v per head, fused in VMEM.

    Np must be lane-aligned (multiple of 128 recommended); rows >= n_valid of
    q may be arbitrary (their outputs are garbage — slice them off); columns
    >= n_valid of kt/v must exist but are masked out of the softmax.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    BH, Np, hd = q.shape
    assert kt.shape == (BH, hd, Np) and v.shape == (BH, Np, hd)
    G = group
    while BH % G:
        G //= 2
    scale = 1.0 / float(hd) ** 0.5
    kernel = functools.partial(
        _mhsa_kernel, n_valid=n_valid, scale=scale, out_dtype=v.dtype
    )
    return pl.pallas_call(
        kernel,
        grid=(BH // G,),
        in_specs=[
            pl.BlockSpec((G, Np, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, hd, Np), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Np, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Np, hd), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((BH, Np, hd), v.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * BH * Np * Np * hd,
            bytes_accessed=q.size * q.dtype.itemsize * 4,
            transcendentals=BH * Np * Np,
        ),
        interpret=interpret,
    )(q, kt, v)


def attention_fused(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    heads: int, group: int = 16,
                    interpret: bool | None = None) -> jnp.ndarray:
    """Drop-in replacement for models.vit.attention (q/k/v: [B, N, D]).

    Pads N up to a lane multiple, runs the fused kernel over B*heads heads,
    unpads. The pad/transpose reshapes are cheap bf16 HBM passes that XLA
    fuses into the surrounding projections; the [N, N] scores live only in
    VMEM.
    """
    B, N, D = q.shape
    hd = D // heads
    Np = max(128, _cdiv(N, 128) * 128)
    pad = Np - N

    def split(t, transpose_k=False):
        t = t.reshape(B, N, heads, hd)
        if pad:
            t = jnp.pad(t, ((0, 0), (0, pad), (0, 0), (0, 0)))
        if transpose_k:
            return t.transpose(0, 2, 3, 1).reshape(B * heads, hd, Np)
        return t.transpose(0, 2, 1, 3).reshape(B * heads, Np, hd)

    o = fused_mhsa(split(q), split(k, transpose_k=True), split(v),
                   n_valid=N, group=group, interpret=interpret)
    o = o.reshape(B, heads, Np, hd).transpose(0, 2, 1, 3)
    return o[:, :N].reshape(B, N, D)

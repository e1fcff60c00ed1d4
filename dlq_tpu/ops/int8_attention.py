"""XLA-lowered dynamically-quantized int8 attention.

The Mosaic-independent hedge for the ViT interior (VERDICT r3 #2): the
Pallas in-kernel int8 attention (`pallas_vit_block._mhsa_batched_i8_into_scratch`)
SIGABRTs Mosaic layout inference on libtpu 0.0.34, so the int8 MXU rate for
QKᵀ and scores·V was unreachable from inside the fused block kernel. This
module runs the SAME math as plain `lax.dot_general` int8×int8→int32 at the
XLA level — no Mosaic involved — so it compiles on any libtpu.

Quantization scheme (calibration-free, mirrors the blocked in-kernel
variant):
  * Q, K, V: dynamic per-(sample, head) symmetric amax scales — attention
    inputs vary per token stream, so static calibration would add sites for
    no accuracy win at seq 197.
  * softmax probabilities: static scale 1/127 (probs live in [0, 1]).
  * accumulation int32 on the MXU's 2x int8 rate; rescale fp32.

Reference tie: the reference's per-kernel dtype experiments are the method
(`reports/Step2.md:164-168` INT8 next-steps); attention itself has no
reference analogue (CNN/MLP only, SURVEY §5.7).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _split_heads(t: jnp.ndarray, heads: int, hd: int) -> jnp.ndarray:
    B, N, _ = t.shape
    return t.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)


def attention_int8_dynamic(q, k, v, heads: int, n_valid: int | None = None,
                           out_dtype=None) -> jnp.ndarray:
    """softmax(QKᵀ/√d)V with both matmuls as int8 dot_general.

    q/k/v: [B, N, heads*hd] (head-concatenated). n_valid masks key columns
    beyond the real sequence length (pad rows of a padded residual stream).
    Returns [B, N, heads*hd] in out_dtype (default: q.dtype).
    """
    B, N, D = q.shape
    hd = D // heads
    scale = 1.0 / float(hd) ** 0.5
    qf = _split_heads(q.astype(jnp.float32), heads, hd)
    kf = _split_heads(k.astype(jnp.float32), heads, hd)
    vf = _split_heads(v.astype(jnp.float32), heads, hd)
    if n_valid is not None and n_valid != N:
        # pad rows of a padded residual stream hold garbage after the first
        # block; left in, they inflate the dynamic amax and waste int8
        # resolution on the valid tokens (ADVICE r4 #3). Zero them: pad KEY
        # rows are masked out of the softmax below anyway, and pad QUERY
        # rows' outputs are discarded by the caller.
        row = jax.lax.broadcasted_iota(jnp.int32, (B, heads, N, hd), 2)
        valid = row < n_valid
        qf = jnp.where(valid, qf, 0.0)
        kf = jnp.where(valid, kf, 0.0)
        vf = jnp.where(valid, vf, 0.0)

    def dyn(a):
        amax = jnp.max(jnp.abs(a), axis=(2, 3), keepdims=True) + 1e-9
        q8 = jnp.clip(jnp.round(a * (127.0 / amax)), -127, 127).astype(jnp.int8)
        return q8, amax

    q8, aq = dyn(qf)
    k8, ak = dyn(kf)
    v8, av_scale = dyn(vf)
    s = jax.lax.dot_general(
        q8, k8, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (aq * ak * (scale / (127.0 * 127.0)))
    if n_valid is not None and n_valid != N:
        col = jax.lax.broadcasted_iota(jnp.int32, (B, heads, N, N), 3)
        s = jnp.where(col < n_valid, s, -1e30)
    attn = jax.nn.softmax(s, axis=-1)
    a8 = jnp.clip(jnp.round(attn * 127.0), 0, 127).astype(jnp.int8)
    out = jax.lax.dot_general(
        a8, v8, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.int32,
    ).astype(jnp.float32) * (av_scale / (127.0 * 127.0))
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out.astype(out_dtype or q.dtype)


def attention_bf16_masked(q, k, v, heads: int, n_valid: int | None = None,
                          out_dtype=None) -> jnp.ndarray:
    """bf16 control arm for the split-block A/B: numerically mirrors the
    in-kernel batched attention (`_mhsa_batched_into_scratch` sm_mode=exact —
    bf16 inputs, fp32 score accum, exact softmax, bf16 probs into the AV
    dot) so any split-vs-fused delta isolates the KERNEL-BOUNDARY cost, not
    an attention-math change."""
    B, N, D = q.shape
    hd = D // heads
    scale = 1.0 / float(hd) ** 0.5
    q4 = _split_heads(q.astype(jnp.bfloat16), heads, hd)
    k4 = _split_heads(k.astype(jnp.bfloat16), heads, hd)
    v4 = _split_heads(v.astype(jnp.bfloat16), heads, hd)
    s = jax.lax.dot_general(
        q4, k4, (((3,), (3,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    ) * scale
    if n_valid is not None and n_valid != N:
        col = jax.lax.broadcasted_iota(jnp.int32, (B, heads, N, N), 3)
        s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m)
    attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
    out = jax.lax.dot_general(
        attn, v4, (((3,), (2,)), ((0, 1), (0, 1))),
        preferred_element_type=jnp.float32,
    )
    out = out.transpose(0, 2, 1, 3).reshape(B, N, D)
    return out.astype(out_dtype or q.dtype)

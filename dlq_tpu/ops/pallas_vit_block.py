"""Pallas TPU fused transformer block: LN1 -> QKV -> MHSA -> proj -> +res ->
LN2 -> FC1 -> GELU -> FC2 -> +res, one kernel per layer, per-batch-group grid.

Why (tools/bench_vit_breakdown.py, v5e b256 DeiT-Ti): the unfused forward is
elementwise/HBM-bound — attention 7.7 ms, LayerNorms 7.2 ms, exact GELU
5.8 ms of a 22.7 ms forward — and piecemeal Pallas kernels lose their wins
to fusion barriers at every pallas_call boundary. This kernel crosses HBM
once in and once out per (layer, batch-group): every intermediate (scores,
softmax, LN moments, GELU) lives in VMEM.

Layout contract (pack_vit_blocks): tokens padded N->Np (lane multiple),
features D->Dp (hd-aligned lane multiple, padded head slots are zero weights
so the zero lanes self-propagate), QKV weight columns [q(Dp)|k(Dp)|v(Dp)]
with heads at hd-offsets. All patterns (64-offset lane slices, NT
dot_general, lane-offset scratch writes, in-kernel merge-reshape, tanh) are
probed green on TPU by tools/probe_mosaic_patterns.py.

Reference analogue: none (the reference is CNN-only) — this is the
framework's ViT deploy path; semantics match models/vit.vit_forward.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def vit_pads(cfg, tight: bool = False):
    """(Np, Dp) padding for the fused block kernels.

    Default (conservative): both rounded up to lane multiples of 128 —
    DeiT-Ti pays (256/197)^2 on attention and 256/192 on every matmul dim.
    tight=True: tokens live on SUBLANES in the [rows, Dp] layout, so Np only
    needs the sublane granule (8) -> 200; Dp needs head-offset (hd) and
    64-grain lane slicing -> 192 for DeiT-Ti. Cuts padded FLOPs ~35%.
    Both variants are numerically identical (pad lanes/rows are zero and
    masked); tight relies on non-128-multiple lane dims compiling, which
    tools/probe_vit_tight.py verifies on the backend.
    """
    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    if tight:
        Np = _cdiv(max(N, 8), 8) * 8
        gr = hd if hd % 64 == 0 else _cdiv(hd, 64) * 64
        Dp = _cdiv(max(D, 128), gr) * gr
    else:
        Np = _cdiv(max(N, 128), 128) * 128
        Dp = _cdiv(max(D, 128), 128) * 128
    assert Dp % hd == 0, (Dp, hd)
    return Np, Dp


def _ln_f32(x, g, b, d_valid, eps=1e-6):
    """LN over Dp lanes, exact over the d_valid prefix (pad lanes are zero
    on entry and zero on exit because g/b are zero-padded)."""
    inv_n = 1.0 / float(d_valid)
    mu = jnp.sum(x, -1, keepdims=True) * inv_n
    m2 = jnp.sum(x * x, -1, keepdims=True) * inv_n
    var = jnp.maximum(m2 - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _ln_mxu_f32(x, g, b, d_valid, eps=1e-6):
    """LN with the two lane-reductions (sum, sum-of-squares) computed as one
    MXU dot [rows, Dp] @ [Dp, 2-in-8] instead of VPU shuffle-reduce chains —
    the moments' FLOPs are trivial on the systolic array and free the VPU for
    the rest of the in-kernel elementwise chain. Same math as _ln_f32."""
    Dp = x.shape[-1]
    inv_n = 1.0 / float(d_valid)
    # cols 0..3: ones (sum); cols 4..7: unused zeros (8-lane-minimum block)
    ones = jnp.concatenate(
        [jnp.ones((Dp, 4), jnp.float32), jnp.zeros((Dp, 4), jnp.float32)], -1)
    s1 = jax.lax.dot(x, ones, preferred_element_type=jnp.float32)
    s2 = jax.lax.dot(x * x, ones, preferred_element_type=jnp.float32)
    mu = s1[:, 0:1] * inv_n
    m2 = s2[:, 0:1] * inv_n
    var = jnp.maximum(m2 - mu * mu, 0.0)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _mhsa_into_scratch(qkv, attn_scr, *, Bt, Np, Dp, heads, hd, n_valid):
    """Per-(sample, head) softmax(QKᵀ/√d)V from the fused qkv value into the
    lane-sliced scratch (head-merge is free: heads live at hd-offsets)."""
    scale = 1.0 / float(hd) ** 0.5
    col = jax.lax.broadcasted_iota(jnp.int32, (Np, Np), 1)
    if heads * hd < Dp:  # zero the padded head lanes once per step
        attn_scr[:, heads * hd :] = jnp.zeros_like(attn_scr[:, heads * hd :])
    for bt in range(Bt):
        r0 = bt * Np
        for h in range(heads):
            c0 = h * hd
            qh = qkv[r0 : r0 + Np, c0 : c0 + hd]
            kh = qkv[r0 : r0 + Np, Dp + c0 : Dp + c0 + hd]
            vh = qkv[r0 : r0 + Np, 2 * Dp + c0 : 2 * Dp + c0 + hd]
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            if n_valid != Np:
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
            attn_scr[r0 : r0 + Np, c0 : c0 + hd] = jax.lax.dot(
                attn, vh, preferred_element_type=jnp.float32
            ).astype(jnp.bfloat16)


def _mhsa_batched_into_scratch(qkv, attn_scr, *, Bt, Np, Dp, heads, hd,
                               n_valid, sm_mode="exact"):
    """Batched-attention variant: one 3D batched dot_general per head for
    scores and one for AV (2*heads dots per grid step instead of
    2*heads*Bt small serial ones — the serial issue overhead dominated the
    loop form; patterns probed by tools/probe_batched_dot.py).

    sm_mode selects the softmax implementation (ablation/optimization study,
    tools/bench_vit_interior.py):
      exact  — max-subtracted softmax with where-mask (default, bit-stable)
      recip  — exact numerator, denominator applied as reciprocal-multiply
      nomax  — static shift (clip at 64, shift 32) + multiplicative mask +
               reciprocal-multiply: drops the per-row max lane-reduction;
               mathematically identical (softmax is shift-invariant), exact
               while scores < 64 (calibrated W8A8 scores are O(1..10))
      bf16   — scores dot emits bf16 and the whole softmax chain runs in
               bf16 (halves scores VMEM traffic; wins only if the VPU packs
               bf16 2x); ~2-digit attention-weight precision
      linear — no softmax at all (timing ablation only, wrong numerics)
    """
    scale = 1.0 / float(hd) ** 0.5
    q3 = qkv.reshape(Bt, Np, 3 * Dp)
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, Np, Np), 2)
    if heads * hd < Dp:
        attn_scr[:, heads * hd :] = jnp.zeros_like(attn_scr[:, heads * hd :])
    maskf = (col < n_valid).astype(jnp.float32) if (
        sm_mode == "nomax" and n_valid != Np) else None
    for h in range(heads):
        c0 = h * hd
        qh = q3[:, :, c0 : c0 + hd]
        kh = q3[:, :, Dp + c0 : Dp + c0 + hd]
        vh = q3[:, :, 2 * Dp + c0 : 2 * Dp + c0 + hd]
        s = jax.lax.dot_general(
            qh, kh, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        if sm_mode == "linear":
            attn = (s * (1.0 / Np)).astype(jnp.bfloat16)
        elif sm_mode == "bf16":
            # Mosaic requires 32-bit matmul accumulation, so convert after
            # the dot; the max/exp/sum/div chain then runs on bf16 vregs
            sb = s.astype(jnp.bfloat16)
            if n_valid != Np:
                sb = jnp.where(col < n_valid, sb, jnp.bfloat16(-1e30))
            m = jnp.max(sb, -1, keepdims=True)
            p = jnp.exp(sb - m)
            attn = p / jnp.sum(p, -1, keepdims=True)
        elif sm_mode == "nomax":
            p = jnp.exp(jnp.minimum(s, 64.0) - 32.0)
            if maskf is not None:
                p = p * maskf
            r = 1.0 / jnp.sum(p, -1, keepdims=True)
            attn = (p * r).astype(jnp.bfloat16)
        else:
            if n_valid != Np:
                s = jnp.where(col < n_valid, s, -1e30)
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            if sm_mode == "recip":
                r = 1.0 / jnp.sum(p, -1, keepdims=True)
                attn = (p * r).astype(jnp.bfloat16)
            else:
                attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
        av = jax.lax.dot_general(
            attn, vh, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )
        attn_scr[:, c0 : c0 + hd] = av.reshape(Bt * Np, hd).astype(jnp.bfloat16)


def _mhsa_headstack_into_scratch(qkv, attn_scr, qs, ks, vs, *, Bt, Np, Dp,
                                 heads, hd, n_valid):
    """Head-stacked attention: copy each head's Q/K/V lane-slice into
    head-major scratches [heads*Bt*Np, 128] (64-grain lane-offset reads +
    sublane-offset scratch writes — both probed green), then run scores and
    AV as ONE batched 3D dot each with batch dim heads*Bt — 2 MXU issues
    per layer-step instead of 2*heads. K zero-pad 64->128 is exact (adding
    0.0), so this is bit-identical to the per-head batched form; it wins iff
    the small serial dots were issue/latency-bound (round-1 breakdown:
    attention dots ~1.73 ms of 6.17)."""
    scale = 1.0 / float(hd) ** 0.5
    lanes = qs.shape[-1]
    HB = heads * Bt
    rows = Bt * Np
    if hd < lanes:  # zero the pad lanes once per grid step (persist OK)
        qs[:, hd:] = jnp.zeros_like(qs[:, hd:])
        ks[:, hd:] = jnp.zeros_like(ks[:, hd:])
        vs[:, hd:] = jnp.zeros_like(vs[:, hd:])
    for h in range(heads):
        c0 = h * hd
        r0 = h * rows
        qs[r0 : r0 + rows, :hd] = qkv[:, c0 : c0 + hd]
        ks[r0 : r0 + rows, :hd] = qkv[:, Dp + c0 : Dp + c0 + hd]
        vs[r0 : r0 + rows, :hd] = qkv[:, 2 * Dp + c0 : 2 * Dp + c0 + hd]
    q4 = qs[:].reshape(HB, Np, lanes)
    k4 = ks[:].reshape(HB, Np, lanes)
    v4 = vs[:].reshape(HB, Np, lanes)
    s = jax.lax.dot_general(
        q4, k4, (((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale
    if n_valid != Np:
        col = jax.lax.broadcasted_iota(jnp.int32, (HB, Np, Np), 2)
        s = jnp.where(col < n_valid, s, -1e30)
    m = jnp.max(s, -1, keepdims=True)
    p = jnp.exp(s - m)
    attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
    av = jax.lax.dot_general(
        attn, v4, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(HB * Np, lanes)
    if heads * hd < Dp:
        attn_scr[:, heads * hd :] = jnp.zeros_like(attn_scr[:, heads * hd :])
    for h in range(heads):
        c0 = h * hd
        r0 = h * rows
        attn_scr[:, c0 : c0 + hd] = av[r0 : r0 + rows, :hd].astype(jnp.bfloat16)


def _mhsa_batched_i8_into_scratch(qkv, attn_scr, *, Bt, Np, Dp, heads, hd,
                                  n_valid):
    """Dynamically-quantized int8 attention: per-(sample, head) amax scales
    computed in-kernel (no extra calibration sites), scores and AV run as
    int8 batched dots on the MXU's 2x int8 rate. Softmax probabilities are
    in [0,1] so their scale is statically 1/127."""
    scale = 1.0 / float(hd) ** 0.5
    q3 = qkv.reshape(Bt, Np, 3 * Dp)
    col = jax.lax.broadcasted_iota(jnp.int32, (Bt, Np, Np), 2)
    if heads * hd < Dp:
        attn_scr[:, heads * hd :] = jnp.zeros_like(attn_scr[:, heads * hd :])

    def dyn_q(a):
        amax = jnp.max(jnp.abs(a), axis=(1, 2), keepdims=True) + 1e-9
        q = jnp.clip(jnp.round(a * (127.0 / amax)), -127, 127).astype(jnp.int8)
        return q, amax

    for h in range(heads):
        c0 = h * hd
        qh = q3[:, :, c0 : c0 + hd].astype(jnp.float32)
        kh = q3[:, :, Dp + c0 : Dp + c0 + hd].astype(jnp.float32)
        vh = q3[:, :, 2 * Dp + c0 : 2 * Dp + c0 + hd].astype(jnp.float32)
        q8, aq = dyn_q(qh)
        k8, ak = dyn_q(kh)
        v8, av_s = dyn_q(vh)
        s = jax.lax.dot_general(
            q8, k8, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (aq * ak * (scale / (127.0 * 127.0)))
        if n_valid != Np:
            s = jnp.where(col < n_valid, s, -1e30)
        m = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - m)
        attn = p / jnp.sum(p, -1, keepdims=True)
        a8 = jnp.clip(jnp.round(attn * 127.0), 0, 127).astype(jnp.int8)
        av = jax.lax.dot_general(
            a8, v8, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * (av_s / (127.0 * 127.0))
        attn_scr[:, c0 : c0 + hd] = av.reshape(Bt * Np, hd).astype(jnp.bfloat16)


def _gelu_f32(f, tanh_approx: bool):
    if tanh_approx:
        c = 0.7978845608028654  # sqrt(2/pi)
        return 0.5 * f * (1.0 + jnp.tanh(c * (f + 0.044715 * f * f * f)))
    return jax.nn.gelu(f, approximate=False)


def _quant_i8(x, inv_scale):
    return jnp.clip(jnp.round(x * inv_scale), -127, 127).astype(jnp.int8)


def _block_kernel(y_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                  ln1_ref, ln2_ref, wfc1_ref, bfc1_ref, wfc2_ref, bfc2_ref,
                  o_ref, attn_scr,
                  *, n_valid, d_valid, heads, hd, gelu_tanh, batched_attn):
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    ln1 = ln1_ref[:].astype(jnp.float32)   # [2, Dp] (g, b)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid).astype(jnp.bfloat16)

    qkv = jax.lax.dot(h1, wqkv_ref[:], preferred_element_type=jnp.float32)
    qkv = (qkv + bqkv_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    a = jax.lax.dot(attn_scr[:], wproj_ref[:], preferred_element_type=jnp.float32)
    a = a + bproj_ref[:].astype(jnp.float32)
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid).astype(jnp.bfloat16)
    f = jax.lax.dot(h2, wfc1_ref[:], preferred_element_type=jnp.float32)
    f = f + bfc1_ref[:].astype(jnp.float32)
    f = _gelu_f32(f, gelu_tanh).astype(jnp.bfloat16)
    out = z1 + jax.lax.dot(f, wfc2_ref[:], preferred_element_type=jnp.float32)
    out = out + bfc2_ref[:].astype(jnp.float32)
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


def _block_kernel_w8(y_ref, inv_ref,
                     wqkv_ref, sqkv_ref, bqkv_ref,
                     wproj_ref, sproj_ref, bproj_ref,
                     ln1_ref, ln2_ref,
                     wfc1_ref, sfc1_ref, bfc1_ref,
                     wfc2_ref, sfc2_ref, bfc2_ref,
                     o_ref, attn_scr,
                     *, n_valid, d_valid, heads, hd, gelu_tanh, batched_attn):
    """W8A8 variant: weights resident int8 (per-channel scales folded with the
    calibrated static activation scales into s*_ref rows), activations
    quantized in-register at each matmul site, int8xint8->int32 on the MXU.
    Same numerics contract as ops/qops.qdense (round-half-even, clip +-127).
    inv_ref: SMEM [1,4] inverse activation scales (qkv, proj, fc1, fc2)."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid)
    acc = jax.lax.dot(_quant_i8(h1, inv_ref[0, 0]), wqkv_ref[:],
                      preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * sqkv_ref[:] + bqkv_ref[:]).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    acc = jax.lax.dot(_quant_i8(attn_scr[:].astype(jnp.float32), inv_ref[0, 1]),
                      wproj_ref[:], preferred_element_type=jnp.int32)
    a = acc.astype(jnp.float32) * sproj_ref[:] + bproj_ref[:]
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid)
    acc = jax.lax.dot(_quant_i8(h2, inv_ref[0, 2]), wfc1_ref[:],
                      preferred_element_type=jnp.int32)
    f = acc.astype(jnp.float32) * sfc1_ref[:] + bfc1_ref[:]
    f = _gelu_f32(f, gelu_tanh)
    acc = jax.lax.dot(_quant_i8(f, inv_ref[0, 3]), wfc2_ref[:],
                      preferred_element_type=jnp.int32)
    out = z1 + acc.astype(jnp.float32) * sfc2_ref[:] + bfc2_ref[:]
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                    n_valid: int, d_valid: int, heads: int, hd: int,
                    bt: int = 4, gelu_tanh: bool = True,
                    batched_attn: bool = True,
                    interpret: bool | None = None) -> jnp.ndarray:
    """One transformer block on the padded residual stream y [B, Np, Dp]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    H = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((Dp, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp, H)), full((1, H)),
            full((H, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * bt * Np * Dp * (3 * Dp + Dp + 2 * H) * (B // bt)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2 + (4 * Dp * Dp + 2 * Dp * H) * 2,
            transcendentals=B * heads * Np * Np + B * Np * H,
        ),
        interpret=interpret,
    )(y, w["wqkv"], w["bqkv"], w["wproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["bfc1"], w["wfc2"], w["bfc2"])


def _multiblock_kernel_w8(y_ref, inv_ref,
                          wqkv_ref, sqkv_ref, bqkv_ref,
                          wproj_ref, sproj_ref, bproj_ref, ln_ref,
                          wfc1_ref, sfc1_ref, bfc1_ref,
                          wfc2_ref, sfc2_ref, bfc2_ref,
                          o_ref, attn_scr, *scr,
                          L, n_valid, d_valid, heads, hd, gelu_tanh,
                          batched_attn, attn_int8, ablate=()):
    """L stacked W8A8 transformer layers per kernel: the residual stream
    stays in VMEM (fp32) across the whole chunk — one HBM round-trip per
    (chunk, batch-group) instead of per layer, and 1/L the per-step fixed
    cost. Weight stacks are leading-dim indexed per layer. Marginally
    BETTER numerics than the 1-layer kernel (no bf16 HBM round-trip of the
    residual between in-chunk layers).

    ablate (static tuple; tools/bench_vit_interior.py) isolates the cost of
    each interior phase by replacing it with a shape-preserving stub —
    timing-only, wrong numerics: "ln" (identity), "gelu", "quant" (cast
    without round/clip), "softmax" (linear attn), "attn" (skip MHSA),
    "epilogue" (skip rescale+bias). "sm_recip"/"sm_nomax" are real
    optimizations (see _mhsa_batched_into_scratch)."""
    abl = frozenset(ablate)
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    xf = y_ref[:].reshape(rows, Dp).astype(jnp.float32)
    if attn_int8:
        mhsa = _mhsa_batched_i8_into_scratch
    else:
        mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    sm_mode = "exact"
    for key, mode in (("softmax", "linear"), ("sm_recip", "recip"),
                      ("sm_nomax", "nomax"), ("sm_bf16", "bf16")):
        if key in abl:
            sm_mode = mode
    if "attn_headstack" in abl:
        mhsa = lambda qkv, a_scr, **kw: _mhsa_headstack_into_scratch(
            qkv, a_scr, scr[0], scr[1], scr[2], **kw)
    elif batched_attn and not attn_int8:
        mhsa = functools.partial(mhsa, sm_mode=sm_mode)
    if "ln" in abl:
        ln_fn = lambda x, g, b, d: x
    elif "ln_mxu" in abl:
        ln_fn = _ln_mxu_f32
    else:
        ln_fn = _ln_f32
    if "quant" in abl:
        q_fn = lambda x, inv: (x * inv).astype(jnp.int8)
    else:
        q_fn = _quant_i8
    if "gelu" in abl:
        gelu_fn = lambda f, t: f
    elif "gelu_bf16" in abl:
        # tanh chain in bf16 (wins only if the VPU packs bf16 2x); the
        # following quantize re-promotes to f32 at its multiply
        gelu_fn = lambda f, t: _gelu_f32(f.astype(jnp.bfloat16), t)
    else:
        gelu_fn = _gelu_f32
    if "epilogue" in abl:
        epi = lambda acc, s, b: acc.astype(jnp.float32)
    else:
        epi = lambda acc, s, b: acc.astype(jnp.float32) * s + b
    for l in range(L):
        ln = ln_ref[l].astype(jnp.float32)   # [4, Dp] = ln1 g,b / ln2 g,b
        h1 = ln_fn(xf, ln[0:1], ln[1:2], d_valid)
        acc = jax.lax.dot(q_fn(h1, inv_ref[l, 0]), wqkv_ref[l],
                          preferred_element_type=jnp.int32)
        qkv = epi(acc, sqkv_ref[l], bqkv_ref[l]).astype(jnp.bfloat16)
        if "attn" in abl:
            attn_scr[:] = qkv[:, :Dp]
        else:
            mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
                 n_valid=n_valid)
        acc = jax.lax.dot(
            q_fn(attn_scr[:].astype(jnp.float32), inv_ref[l, 1]),
            wproj_ref[l], preferred_element_type=jnp.int32)
        z1 = xf + epi(acc, sproj_ref[l], bproj_ref[l])
        h2 = ln_fn(z1, ln[2:3], ln[3:4], d_valid)
        acc = jax.lax.dot(q_fn(h2, inv_ref[l, 2]), wfc1_ref[l],
                          preferred_element_type=jnp.int32)
        f = epi(acc, sfc1_ref[l], bfc1_ref[l])
        f = gelu_fn(f, gelu_tanh)
        acc = jax.lax.dot(q_fn(f, inv_ref[l, 3]), wfc2_ref[l],
                          preferred_element_type=jnp.int32)
        xf = z1 + epi(acc, sfc2_ref[l], bfc2_ref[l])
    o_ref[:] = xf.astype(o_ref.dtype).reshape(Bt, Np, Dp)


def _stack_blocks(packed: Dict[str, Any], layers_per_kernel: int,
                  with_inv: bool) -> List[Dict[str, jnp.ndarray]]:
    """Group per-layer blocks into stacked chunks for the multi-layer
    kernels (one leading L axis per weight kind; ln1/ln2 merged into a
    [L,4,Dp] stack; `inv` act-scale stack only for the quantized-act
    variants). Shared by the W8/W4/W4A8 stackers."""
    blocks = packed["blocks"]
    L = layers_per_kernel
    assert len(blocks) % L == 0, (len(blocks), L)
    chunks = []
    for c in range(0, len(blocks), L):
        grp = blocks[c : c + L]
        chunk = ({"inv": jnp.concatenate([b["inv_act"] for b in grp], axis=0)}
                 if with_inv else {})
        for k in ("wqkv", "sqkv", "bqkv", "wproj", "sproj", "bproj",
                  "wfc1", "sfc1", "bfc1", "wfc2", "sfc2", "bfc2"):
            chunk[k] = jnp.stack([b[k] for b in grp])
        chunk["ln"] = jnp.stack(
            [jnp.concatenate([b["ln1"], b["ln2"]], axis=0) for b in grp])
        chunks.append(chunk)
    return chunks


def stack_vit_blocks_w8(packed: Dict[str, Any], layers_per_kernel: int
                        ) -> List[Dict[str, jnp.ndarray]]:
    """Stacked chunks for the W8A8 multi-layer kernel."""
    return _stack_blocks(packed, layers_per_kernel, with_inv=True)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "attn_int8", "ablate", "interpret"))
def vit_multiblock_fused_w8(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                            n_valid: int, d_valid: int, heads: int, hd: int,
                            bt: int = 8, gelu_tanh: bool = True,
                            batched_attn: bool = True,
                            attn_int8: bool = False,
                            ablate: tuple = (),
                            interpret: bool | None = None) -> jnp.ndarray:
    """One stacked chunk (L layers) of W8A8 transformer blocks on the padded
    residual stream y [B, Np, Dp]."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    L = w["wqkv"].shape[0]
    H = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _multiblock_kernel_w8, L=L, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
        attn_int8=attn_int8, ablate=ablate,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((L, Dp, 3 * Dp)), full((L, 1, 3 * Dp)), full((L, 1, 3 * Dp)),
            full((L, Dp, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
            full((L, 4, Dp)),
            full((L, Dp, H)), full((L, 1, H)), full((L, 1, H)),
            full((L, H, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=(
            [pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)]
            + ([pltpu.VMEM((heads * bt * Np, max(hd, 128)), jnp.bfloat16)] * 3
               if "attn_headstack" in ablate else [])
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * Np * Dp * (3 * Dp + Dp + 2 * H)
            + 4 * L * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + L * (4 * Dp * Dp + 2 * Dp * H),
            transcendentals=L * B * (heads * Np * Np + Np * H),
        ),
        interpret=interpret,
    )(y, w["inv"], w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_forward_multiblock_w8(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                              layers_per_kernel: int = 12, bt: int = 8,
                              gelu_tanh: bool = True, tight: bool = True,
                              attn_int8: bool = False, ablate: tuple = (),
                              conv_embed: bool = True,
                              interpret: bool | None = None) -> jnp.ndarray:
    """W8A8 forward on stacked multi-layer kernels (chunks of
    layers_per_kernel). `packed` from pack_vit_blocks_w8(..., tight=...).
    x may be raw uint8 NHWC (preprocess folds into the embed)."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    chunks = packed.get("_chunks")
    if chunks is None:
        chunks = stack_vit_blocks_w8(packed, layers_per_kernel)
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in chunks:
        y = vit_multiblock_fused_w8(y, w, n_valid=N, d_valid=D,
                                    heads=cfg.heads, hd=hd, bt=bt,
                                    gelu_tanh=gelu_tanh, attn_int8=attn_int8,
                                    ablate=ablate, interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused_w8(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                       n_valid: int, d_valid: int, heads: int, hd: int,
                       bt: int = 8, gelu_tanh: bool = True,
                       batched_attn: bool = True,
                       interpret: bool | None = None) -> jnp.ndarray:
    """W8A8 fused transformer block (weights int8-resident in HBM)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    H = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel_w8, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((Dp, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp, H)), full((1, H)), full((1, H)),
            full((H, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (3 * Dp + Dp + 2 * H)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2 + 4 * Dp * Dp + 2 * Dp * H,
            transcendentals=B * heads * Np * Np + B * Np * H,
        ),
        interpret=interpret,
    )(y, w["inv_act"], w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


# ---------------------------------------------------------------------------
# offline packing + full forward
# ---------------------------------------------------------------------------

def embed_tokens(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                 conv_embed: bool = True, mean=None, std=None) -> jnp.ndarray:
    """Patch embedding [B,H,W,C] -> [B, N-1, D] tokens.

    conv_embed=True runs patchify@W as ONE strided conv (exact rewrite:
    out[b,i,j,d] = sum_{u,v,c} x[b,ip+u,jp+v,c] * W[(u,v,c),d]), skipping
    the 6D transpose relayout of models/vit.patchify — the embed stage
    measured 0.66 ms of the 6.98 ms DeiT forward, mostly that relayout.

    uint8 input: raw-image ingest with the preprocess fold (same scheme as
    the ResNet stem, model_quant.conv_stem_bf16_u8): x_norm =
    (u - 255*mean)/(255*std), the 1/(255*std_c) folds into the patch
    weights and the -255*mean shift is a fused subtract. 4x less input
    bandwidth than fp32 NHWC."""
    from dlq_tpu.models.vit import patchify

    p = cfg.patch
    B, H, W, C = x.shape
    wf = packed["patch"]["w"]  # [p*p*C, D]
    D = wf.shape[-1]
    if x.dtype == jnp.uint8:
        import numpy as _np

        from dlq_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

        mean = IMAGENET_MEAN if mean is None else mean
        std = IMAGENET_STD if std is None else std
        inv = 1.0 / (255.0 * _np.asarray(std, _np.float32))
        w4 = (wf.astype(jnp.float32).reshape(p, p, C, D)
              * jnp.asarray(inv)[None, None, :, None]).astype(jnp.bfloat16)
        xb = x.astype(jnp.bfloat16) - jnp.asarray(
            255.0 * _np.asarray(mean, _np.float32), jnp.bfloat16)
        conv_embed = True  # the fold is only expressed in conv form
    else:
        xb = x.astype(jnp.bfloat16)
        w4 = wf.reshape(p, p, C, D).astype(jnp.bfloat16)
    if conv_embed:
        y = jax.lax.conv_general_dilated(
            xb, w4, (p, p), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).reshape(B, -1, D).astype(jnp.bfloat16)
    else:
        y = jnp.dot(patchify(xb, p), wf,
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    return y + packed["patch"]["b"]

def pack_vit_blocks(params: Dict[str, Any], cfg, tight: bool = False
                    ) -> Dict[str, Any]:
    """Pad/pack fp32 ViT params (models/vit.init_vit layout) for the fused
    block kernel: D -> Dp (lane/hd aligned), QKV columns [q|k|v] each Dp wide
    with heads at hd offsets, zero-padded everywhere so pad lanes
    self-propagate as zeros. Returns a pytree of device arrays (bf16).
    tight=True uses the minimal pads from vit_pads (DeiT-Ti: Np 200, Dp 192
    instead of 256/256 — ~35% fewer padded FLOPs)."""
    D = cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    N = cfg.seq_len
    H = cfg.mlp_ratio * D
    Hp = _cdiv(H, 128) * 128

    def padw(a, r, c):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    def padv(a, n):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, n - a.shape[0]))

    blocks: List[Dict[str, jnp.ndarray]] = []
    for lp in params["layers"]:
        wq, wk, wv = jnp.split(jnp.asarray(lp["qkv"]["w"], jnp.float32), 3, -1)
        bq, bk, bv = jnp.split(jnp.asarray(lp["qkv"]["b"], jnp.float32), 3, -1)
        wqkv = jnp.concatenate(
            [padw(wq, Dp, Dp), padw(wk, Dp, Dp), padw(wv, Dp, Dp)], axis=-1)
        bqkv = jnp.concatenate([padv(bq, Dp), padv(bk, Dp), padv(bv, Dp)])
        blocks.append({
            "wqkv": wqkv.astype(jnp.bfloat16),
            "bqkv": bqkv.reshape(1, -1).astype(jnp.float32),
            "wproj": padw(lp["proj"]["w"], Dp, Dp).astype(jnp.bfloat16),
            "bproj": padv(lp["proj"]["b"], Dp).reshape(1, -1).astype(jnp.float32),
            "ln1": jnp.stack([padv(lp["ln1"]["g"], Dp), padv(lp["ln1"]["b"], Dp)]),
            "ln2": jnp.stack([padv(lp["ln2"]["g"], Dp), padv(lp["ln2"]["b"], Dp)]),
            "wfc1": padw(lp["fc1"]["w"], Dp, Hp).astype(jnp.bfloat16),
            "bfc1": padv(lp["fc1"]["b"], Hp).reshape(1, -1).astype(jnp.float32),
            "wfc2": padw(lp["fc2"]["w"], Hp, Dp).astype(jnp.bfloat16),
            "bfc2": padv(lp["fc2"]["b"], Dp).reshape(1, -1).astype(jnp.float32),
        })
    return {
        "blocks": blocks,
        "patch": {"w": jnp.asarray(params["patch"]["w"], jnp.bfloat16),
                  "b": jnp.asarray(params["patch"]["b"], jnp.bfloat16)},
        "cls": jnp.asarray(params["cls"], jnp.bfloat16),
        "pos": jnp.asarray(params["pos"], jnp.bfloat16),
        "norm": {"g": jnp.asarray(params["norm"]["g"], jnp.float32),
                 "b": jnp.asarray(params["norm"]["b"], jnp.float32)},
        "head": {"w": jnp.asarray(params["head"]["w"], jnp.bfloat16),
                 "b": jnp.asarray(params["head"]["b"], jnp.float32)},
        # informational only (the forward derives these statically from cfg)
        "dims": jnp.asarray([N, Np, D, Dp, hd], jnp.int32),
    }


def _check_smooth_foldable(smooth: Dict[str, Any]) -> Dict[str, Any]:
    smooth = smooth or {}
    bad = [k for k in smooth if not (k.endswith(".qkv") or k.endswith(".fc1"))]
    if bad:
        raise ValueError(
            f"block-kernel pack can only fold smoothing vectors into LN "
            f"affines (sites *.qkv / *.fc1); got vectors for {bad} — use "
            "quant.recipe.VIT_LN_FOLDABLE as the smooth_site_filter, or "
            "deploy sitewise with SmoothDeployCtx")
    return smooth


def _smooth_folded_ln(ln: Dict[str, Any], smooth: Dict[str, Any],
                      i: int) -> Dict[str, Any]:
    """LN affines with the site smoothing vectors folded in EXACTLY: the
    qkv/fc1 inputs are LN outputs, so x/s == LN with (g/s, b/s). The
    residual stream is untouched (LN outputs feed only their matmul)."""
    out = {"ln1": ln["ln1"], "ln2": ln["ln2"]}
    for key, site in (("ln1", f"l{i}.qkv"), ("ln2", f"l{i}.fc1")):
        s = smooth.get(site)
        if s is not None:
            inv = 1.0 / jnp.asarray(s, jnp.float32)
            out[key] = {"g": jnp.asarray(ln[key]["g"], jnp.float32) * inv,
                        "b": jnp.asarray(ln[key]["b"], jnp.float32) * inv}
    return out


def pack_vit_blocks_w8(qflat: Dict[str, Any], act_scales: Dict[str, Any],
                       extras: Dict[str, Any], cfg, tight: bool = False,
                       smooth: Optional[Dict[str, Any]] = None
                       ) -> Dict[str, Any]:
    """Pack an INT8-quantized ViT (quant.model_quant layout: flatten_vit
    sites + vit_extras) for the W8A8 fused block kernel. Weights stay int8;
    per-channel weight scales fold with the calibrated static activation
    scales into one fp32 row per matmul. tight: see pack_vit_blocks.

    smooth: SmoothQuant vectors restricted to LN-foldable sites
    (quant.recipe.VIT_LN_FOLDABLE) — folded into the LN affines here, so a
    ptq_auto model deploys through the fused kernels with zero runtime
    cost. qflat must already be quantized from the SMOOTHED weights."""
    from dlq_tpu.quant.quantize import dequantize

    smooth = _check_smooth_foldable(smooth)

    D = cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    N = cfg.seq_len
    H = cfg.mlp_ratio * D
    Hp = _cdiv(H, 128) * 128

    def padw8(a, r, c):
        a = jnp.asarray(a, jnp.int8)
        return jnp.pad(a, ((0, r - a.shape[0]), (0, c - a.shape[1])))

    def padv(a, n):
        a = jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, n - a.shape[0]))

    def site(name, cols):
        p = qflat[name]
        qw = p["qw"]
        wscale = jnp.broadcast_to(jnp.asarray(qw.scale, jnp.float32),
                                  (qw.shape[-1],))
        comb = float(act_scales[name]) if not hasattr(act_scales[name], "shape") \
            else act_scales[name]
        comb = jnp.asarray(comb, jnp.float32) * wscale
        b = p.get("b")
        return (qw.values, comb,
                jnp.zeros((qw.shape[-1],), jnp.float32) if b is None else b)

    blocks: List[Dict[str, jnp.ndarray]] = []
    for i in range(cfg.depth):
        wq8, sq, bq = site(f"l{i}.qkv", 3 * D)
        wqs, wks, wvs = jnp.split(jnp.asarray(wq8, jnp.int8), 3, -1)
        sqs, sks, svs = jnp.split(sq, 3)
        bqs, bks, bvs = jnp.split(jnp.asarray(bq, jnp.float32), 3)
        wp8, sp, bp = site(f"l{i}.proj", D)
        wf18, sf1, bf1 = site(f"l{i}.fc1", H)
        wf28, sf2, bf2 = site(f"l{i}.fc2", D)
        ln = _smooth_folded_ln(extras["ln"][i], smooth, i)
        inv = jnp.asarray([[1.0 / float(act_scales[f"l{i}.{s}"])
                            for s in ("qkv", "proj", "fc1", "fc2")]], jnp.float32)
        blocks.append({
            "inv_act": inv,
            "wqkv": jnp.concatenate(
                [padw8(wqs, Dp, Dp), padw8(wks, Dp, Dp), padw8(wvs, Dp, Dp)], -1),
            "sqkv": jnp.concatenate(
                [padv(sqs, Dp), padv(sks, Dp), padv(svs, Dp)]).reshape(1, -1),
            "bqkv": jnp.concatenate(
                [padv(bqs, Dp), padv(bks, Dp), padv(bvs, Dp)]).reshape(1, -1),
            "wproj": padw8(wp8, Dp, Dp),
            "sproj": padv(sp, Dp).reshape(1, -1),
            "bproj": padv(bp, Dp).reshape(1, -1),
            "ln1": jnp.stack([padv(ln["ln1"]["g"], Dp), padv(ln["ln1"]["b"], Dp)]),
            "ln2": jnp.stack([padv(ln["ln2"]["g"], Dp), padv(ln["ln2"]["b"], Dp)]),
            "wfc1": padw8(wf18, Dp, Hp),
            "sfc1": padv(sf1, Hp).reshape(1, -1),
            "bfc1": padv(bf1, Hp).reshape(1, -1),
            "wfc2": padw8(wf28, Hp, Dp),
            "sfc2": padv(sf2, Dp).reshape(1, -1),
            "bfc2": padv(bf2, Dp).reshape(1, -1),
        })
    patch_w = dequantize(qflat["patch"]["qw"]).astype(jnp.bfloat16)
    head_w = dequantize(qflat["head"]["qw"]).astype(jnp.float32)
    return {
        "blocks": blocks,
        "patch": {"w": patch_w,
                  "b": jnp.asarray(qflat["patch"]["b"], jnp.bfloat16)},
        "cls": jnp.asarray(extras["cls"], jnp.bfloat16),
        "pos": jnp.asarray(extras["pos"], jnp.bfloat16),
        "norm": {"g": jnp.asarray(extras["norm"]["g"], jnp.float32),
                 "b": jnp.asarray(extras["norm"]["b"], jnp.float32)},
        "head": {"w": head_w,
                 "b": jnp.asarray(qflat["head"]["b"], jnp.float32)},
    }


def vit_forward_blockfused_w8(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                              bt: int = 8, gelu_tanh: bool = True,
                              tight: bool = False, conv_embed: bool = True,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Quantized (W8A8) fused-block forward — the ViT int8 deploy path.
    `tight` must match the pack_vit_blocks_w8 call that built `packed`."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused_w8(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                               hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                               interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


# ---------------------------------------------------------------------------
# split-attention W8A8 block: Pallas pre/post kernels + XLA attention between
# them — the Mosaic-independent int8-attention A/B (VERDICT r3 #2)
# ---------------------------------------------------------------------------

def _block_pre_kernel_w8(y_ref, inv_ref, wqkv_ref, sqkv_ref, bqkv_ref,
                         ln1_ref, o_ref, *, d_valid):
    """First half of the W8A8 block: LN1 + int8 QKV projection. Emits the
    bf16 qkv stream [bt, Np, 3*Dp] for an attention impl that runs OUTSIDE
    the kernel (XLA int8/bf16 dot_general — no Mosaic)."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    xf = y_ref[:].reshape(rows, Dp).astype(jnp.float32)
    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid)
    acc = jax.lax.dot(_quant_i8(h1, inv_ref[0, 0]), wqkv_ref[:],
                      preferred_element_type=jnp.int32)
    qkv = (acc.astype(jnp.float32) * sqkv_ref[:] + bqkv_ref[:]).astype(jnp.bfloat16)
    o_ref[:] = qkv.reshape(Bt, Np, 3 * Dp)


def _block_post_kernel_w8(y_ref, a_ref, inv_ref,
                          wproj_ref, sproj_ref, bproj_ref, ln2_ref,
                          wfc1_ref, sfc1_ref, bfc1_ref,
                          wfc2_ref, sfc2_ref, bfc2_ref,
                          o_ref, *, d_valid, gelu_tanh):
    """Second half: int8 proj on the attention output, residual, LN2, int8
    MLP, residual. Identical math to the tail of _block_kernel_w8."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    xf = y_ref[:].reshape(rows, Dp).astype(jnp.float32)
    attn = a_ref[:].reshape(rows, Dp).astype(jnp.float32)
    acc = jax.lax.dot(_quant_i8(attn, inv_ref[0, 1]), wproj_ref[:],
                      preferred_element_type=jnp.int32)
    a = acc.astype(jnp.float32) * sproj_ref[:] + bproj_ref[:]
    z1 = xf + a
    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid)
    acc = jax.lax.dot(_quant_i8(h2, inv_ref[0, 2]), wfc1_ref[:],
                      preferred_element_type=jnp.int32)
    f = acc.astype(jnp.float32) * sfc1_ref[:] + bfc1_ref[:]
    f = _gelu_f32(f, gelu_tanh)
    acc = jax.lax.dot(_quant_i8(f, inv_ref[0, 3]), wfc2_ref[:],
                      preferred_element_type=jnp.int32)
    out = z1 + acc.astype(jnp.float32) * sfc2_ref[:] + bfc2_ref[:]
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=("d_valid", "bt", "interpret"))
def vit_block_pre_w8(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                     d_valid: int, bt: int = 8,
                     interpret: bool | None = None) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_pre_kernel_w8, d_valid=d_valid),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((Dp, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((2, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, 3 * Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, 3 * Dp), jnp.bfloat16),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * 3 * Dp,
            bytes_accessed=B * Np * Dp * 2 + 3 * Dp * Dp + B * Np * 3 * Dp * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(y, w["inv_act"], w["wqkv"], w["sqkv"], w["bqkv"], w["ln1"])


@functools.partial(jax.jit, static_argnames=("d_valid", "bt", "gelu_tanh",
                                             "interpret"))
def vit_block_post_w8(y: jnp.ndarray, attn: jnp.ndarray,
                      w: Dict[str, jnp.ndarray], *,
                      d_valid: int, bt: int = 8, gelu_tanh: bool = True,
                      interpret: bool | None = None) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    H = w["wfc1"].shape[-1]
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_block_post_kernel_w8, d_valid=d_valid,
                          gelu_tanh=gelu_tanh),
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((Dp, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)),
            full((Dp, H)), full((1, H)), full((1, H)),
            full((H, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (Dp + 2 * H),
            bytes_accessed=3 * B * Np * Dp * 2 + Dp * Dp + 2 * Dp * H,
            transcendentals=B * Np * H,
        ),
        interpret=interpret,
    )(y, attn, w["inv_act"], w["wproj"], w["sproj"], w["bproj"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_block_w8_splitattn(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                           n_valid: int, d_valid: int, heads: int, hd: int,
                           bt: int = 8, gelu_tanh: bool = True,
                           attn: str = "int8",
                           interpret: bool | None = None) -> jnp.ndarray:
    """W8A8 block with attention OUTSIDE the Pallas kernels: pre-kernel
    (LN1+QKV int8), XLA attention (attn='int8' dynamic-quantized dots on
    the int8 MXU rate, 'bf16' = the control arm isolating the split cost),
    post-kernel (proj+MLP int8). Three dispatches per block instead of one
    — the A/B question is whether the int8 attention rate buys back more
    than the extra qkv/attn HBM round-trips cost."""
    from dlq_tpu.ops.int8_attention import (
        attention_bf16_masked, attention_int8_dynamic,
    )

    B, Np, Dp = y.shape
    qkv = vit_block_pre_w8(y, w, d_valid=d_valid, bt=bt, interpret=interpret)
    hw = heads * hd
    q = qkv[..., :hw]
    k = qkv[..., Dp : Dp + hw]
    v = qkv[..., 2 * Dp : 2 * Dp + hw]
    fn = attention_int8_dynamic if attn == "int8" else attention_bf16_masked
    a = fn(q, k, v, heads, n_valid=n_valid, out_dtype=jnp.bfloat16)
    if hw < Dp:
        a = jnp.pad(a, ((0, 0), (0, 0), (0, Dp - hw)))
    return vit_block_post_w8(y, a, w, d_valid=d_valid, bt=bt,
                             gelu_tanh=gelu_tanh, interpret=interpret)


def vit_forward_blockfused_w8_split(packed: Dict[str, Any], x: jnp.ndarray,
                                    cfg, bt: int = 8, gelu_tanh: bool = True,
                                    tight: bool = False,
                                    conv_embed: bool = True,
                                    attn: str = "int8",
                                    interpret: bool | None = None
                                    ) -> jnp.ndarray:
    """W8A8 DeiT forward on the split-attention block (pack_vit_blocks_w8
    payload — same packing as the fully-fused path)."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_w8_splitattn(y, w, n_valid=N, d_valid=D,
                                   heads=cfg.heads, hd=hd, bt=bt,
                                   gelu_tanh=gelu_tanh, attn=attn,
                                   interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


def vit_forward_blockfused(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                           bt: int = 4, gelu_tanh: bool = True,
                           tight: bool = False, conv_embed: bool = True,
                           interpret: bool | None = None) -> jnp.ndarray:
    """Full DeiT/ViT forward on the fused block kernel (bf16 deploy path).

    Embed + final norm + head run as XLA ops (tiny); the 12 blocks run as
    fused kernels over the padded [B, Np, Dp] residual stream.
    """
    from dlq_tpu.models.vit import layernorm

    # derive statically from cfg (packed["dims"] records the same values but
    # would be traced if read from the pytree under jit)
    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                            hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                            interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"].astype(jnp.float32),
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


# ---------------------------------------------------------------------------
# W4A16 (weight-only int4, per-OC scales) fused block
# ---------------------------------------------------------------------------

def _dot_w4a(x, wp, s, b):
    """x [rows, K] bf16 @ halves-packed int4 weight array [K/2, N] -> f32.

    Byte k holds W[k] (low nibble) and W[k + K/2] (high) — quantize.
    pack_int4_halves. The split contraction then needs only CONTIGUOUS lane
    slices of x (x[:, :K/2], x[:, K/2:]); the adjacent-row packing would
    need the pair-row sublane merge this Mosaic rejects (BENCH_NOTES
    "Environment facts"). Nibble ints are exact in bf16; the per-OC scale
    applies to the f32 accumulator (MORE precise than dequantize-then-dot,
    which rounds w*s to bf16 first)."""
    Kh = wp.shape[0]
    wp = wp.astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
    acc = jax.lax.dot(x[:, :Kh], lo, preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot(x[:, Kh:], hi, preferred_element_type=jnp.float32)
    return acc * s + b


def _dot_w4(x, wp_ref, s_ref, b_ref):
    return _dot_w4a(x, wp_ref[:], s_ref[:], b_ref[:])


def _block_kernel_w4(y_ref,
                     wqkv_ref, sqkv_ref, bqkv_ref,
                     wproj_ref, sproj_ref, bproj_ref,
                     ln1_ref, ln2_ref,
                     wfc1_ref, sfc1_ref, bfc1_ref,
                     wfc2_ref, sfc2_ref, bfc2_ref,
                     o_ref, attn_scr,
                     *, n_valid, d_valid, heads, hd, gelu_tanh, batched_attn):
    """Weight-only variant: int4 weights stay nibble-packed in VMEM (half
    the W8 kernel's weight residency/DMA), activations bf16 throughout —
    no act quantization, bf16 MXU dots with in-register unpack."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid).astype(jnp.bfloat16)
    qkv = _dot_w4(h1, wqkv_ref, sqkv_ref, bqkv_ref).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    a = _dot_w4(attn_scr[:], wproj_ref, sproj_ref, bproj_ref)
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid).astype(jnp.bfloat16)
    f = _dot_w4(h2, wfc1_ref, sfc1_ref, bfc1_ref)
    f = _gelu_f32(f, gelu_tanh).astype(jnp.bfloat16)
    out = z1 + _dot_w4(f, wfc2_ref, sfc2_ref, bfc2_ref)
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused_w4(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                       n_valid: int, d_valid: int, heads: int, hd: int,
                       bt: int = 4, gelu_tanh: bool = True,
                       batched_attn: bool = True,
                       interpret: bool | None = None) -> jnp.ndarray:
    """W4A16 fused transformer block (weights int4-resident end to end)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel_w4, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((Dp // 2, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp // 2, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp // 2, Hcols)), full((1, Hcols)), full((1, Hcols)),
            full((Hcols // 2, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=B * heads * Np * Np + B * Np * Hcols,
        ),
        interpret=interpret,
    )(y, w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def pack_vit_blocks_w4(qflat: Dict[str, Any], extras: Dict[str, Any], cfg,
                       tight: bool = False) -> Dict[str, Any]:
    """Pack a weight-only per-OC INT4 ViT (QScheme(4, True, -1), acts=None)
    for the W4A16 fused block kernel: weights re-packed halves-wise on the
    PADDED [Kp, Ncols] grid (pad rows/cols are zero nibbles, so they
    self-propagate as zeros), per-OC scales one fp32 row per matmul."""
    from dlq_tpu.quant.quantize import dequantize, pack_int4_halves, unpack_int4

    D = cfg.dim
    Np, Dp = vit_pads(cfg, tight)
    H = cfg.mlp_ratio * D
    Hp = _cdiv(H, 128) * 128

    def grid_of(name):
        qw = qflat[name]["qw"]
        if qw.bits != 4 or qw.group is not None:
            raise ValueError(
                f"pack_vit_blocks_w4 needs per-OC int4 weights; {name} is "
                f"bits={qw.bits} group={qw.group}")
        return (unpack_int4(qw.values, qw.shape),
                jnp.broadcast_to(jnp.asarray(qw.scale, jnp.float32),
                                 (qw.shape[-1],)),
                qflat[name].get("b"))

    def padw(a, r, c):
        return jnp.pad(jnp.asarray(a, jnp.int8),
                       ((0, r - a.shape[0]), (0, c - a.shape[1])))

    def padv(a, n, fill=0.0):
        a = jnp.zeros((0,), jnp.float32) if a is None else jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, n - a.shape[0]), constant_values=fill)

    blocks: List[Dict[str, jnp.ndarray]] = []
    for i in range(cfg.depth):
        g_qkv, s_qkv, b_qkv = grid_of(f"l{i}.qkv")
        wq, wk, wv = jnp.split(g_qkv, 3, -1)
        sq, sk, sv = jnp.split(s_qkv, 3)
        bq, bk, bv = jnp.split(jnp.asarray(
            b_qkv if b_qkv is not None else jnp.zeros(3 * D), jnp.float32), 3)
        g_p, s_p, b_p = grid_of(f"l{i}.proj")
        g_f1, s_f1, b_f1 = grid_of(f"l{i}.fc1")
        g_f2, s_f2, b_f2 = grid_of(f"l{i}.fc2")
        ln = extras["ln"][i]
        blocks.append({
            "wqkv": pack_int4_halves(jnp.concatenate(
                [padw(wq, Dp, Dp), padw(wk, Dp, Dp), padw(wv, Dp, Dp)], -1)),
            "sqkv": jnp.concatenate(
                [padv(sq, Dp, 1.0), padv(sk, Dp, 1.0), padv(sv, Dp, 1.0)]
            ).reshape(1, -1),
            "bqkv": jnp.concatenate(
                [padv(bq, Dp), padv(bk, Dp), padv(bv, Dp)]).reshape(1, -1),
            "wproj": pack_int4_halves(padw(g_p, Dp, Dp)),
            "sproj": padv(s_p, Dp, 1.0).reshape(1, -1),
            "bproj": padv(b_p, Dp).reshape(1, -1),
            "ln1": jnp.stack([padv(ln["ln1"]["g"], Dp), padv(ln["ln1"]["b"], Dp)]),
            "ln2": jnp.stack([padv(ln["ln2"]["g"], Dp), padv(ln["ln2"]["b"], Dp)]),
            "wfc1": pack_int4_halves(padw(g_f1, Dp, Hp)),
            "sfc1": padv(s_f1, Hp, 1.0).reshape(1, -1),
            "bfc1": padv(b_f1, Hp).reshape(1, -1),
            "wfc2": pack_int4_halves(padw(g_f2, Hp, Dp)),
            "sfc2": padv(s_f2, Dp, 1.0).reshape(1, -1),
            "bfc2": padv(b_f2, Dp).reshape(1, -1),
        })
    patch_w = dequantize(qflat["patch"]["qw"]).astype(jnp.bfloat16)
    head_w = dequantize(qflat["head"]["qw"]).astype(jnp.float32)
    return {
        "blocks": blocks,
        "patch": {"w": patch_w,
                  "b": jnp.asarray(qflat["patch"]["b"], jnp.bfloat16)},
        "cls": jnp.asarray(extras["cls"], jnp.bfloat16),
        "pos": jnp.asarray(extras["pos"], jnp.bfloat16),
        "norm": {"g": jnp.asarray(extras["norm"]["g"], jnp.float32),
                 "b": jnp.asarray(extras["norm"]["b"], jnp.float32)},
        "head": {"w": head_w,
                 "b": jnp.asarray(qflat["head"]["b"], jnp.float32)},
    }


def vit_forward_blockfused_w4(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                              bt: int = 4, gelu_tanh: bool = True,
                              tight: bool = True, conv_embed: bool = True,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Weight-only INT4 fused-block forward: block weights stay 4-bit in
    HBM/VMEM (half the W8 path's weight traffic, 4x less than bf16); the
    site-wise weight-only deploy measured 6.6k img/s — this path runs the
    same kernels as the 43.6k W8A8 deploy minus act quantization."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused_w4(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                               hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                               interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


def _multiblock_kernel_w4(y_ref,
                          wqkv_ref, sqkv_ref, bqkv_ref,
                          wproj_ref, sproj_ref, bproj_ref, ln_ref,
                          wfc1_ref, sfc1_ref, bfc1_ref,
                          wfc2_ref, sfc2_ref, bfc2_ref,
                          o_ref, attn_scr,
                          *, L, n_valid, d_valid, heads, hd, gelu_tanh,
                          batched_attn):
    """L stacked W4A16 layers per kernel: residual stream VMEM-resident
    (fp32) across the chunk, int4 weight stacks leading-dim indexed per
    layer (HALF the W8 multiblock's weight VMEM — the pressure that made
    its bt=8 lose)."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    xf = y_ref[:].reshape(rows, Dp).astype(jnp.float32)
    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    for l in range(L):
        ln = ln_ref[l].astype(jnp.float32)  # [4, Dp] = ln1 g,b / ln2 g,b
        h1 = _ln_f32(xf, ln[0:1], ln[1:2], d_valid).astype(jnp.bfloat16)
        qkv = _dot_w4a(h1, wqkv_ref[l], sqkv_ref[l], bqkv_ref[l]
                       ).astype(jnp.bfloat16)
        mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
             n_valid=n_valid)
        a = _dot_w4a(attn_scr[:], wproj_ref[l], sproj_ref[l], bproj_ref[l])
        z1 = xf + a
        h2 = _ln_f32(z1, ln[2:3], ln[3:4], d_valid).astype(jnp.bfloat16)
        f = _dot_w4a(h2, wfc1_ref[l], sfc1_ref[l], bfc1_ref[l])
        f = _gelu_f32(f, gelu_tanh).astype(jnp.bfloat16)
        xf = z1 + _dot_w4a(f, wfc2_ref[l], sfc2_ref[l], bfc2_ref[l])
    o_ref[:] = xf.astype(o_ref.dtype).reshape(Bt, Np, Dp)


def stack_vit_blocks_w4(packed: Dict[str, Any], layers_per_kernel: int
                        ) -> List[Dict[str, jnp.ndarray]]:
    """Stacked chunks for the W4A16 multi-layer kernel (no act scales)."""
    return _stack_blocks(packed, layers_per_kernel, with_inv=False)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_multiblock_fused_w4(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                            n_valid: int, d_valid: int, heads: int, hd: int,
                            bt: int = 4, gelu_tanh: bool = True,
                            batched_attn: bool = True,
                            interpret: bool | None = None) -> jnp.ndarray:
    """One stacked chunk (L layers) of W4A16 transformer blocks."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    L = w["wqkv"].shape[0]
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _multiblock_kernel_w4, L=L, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full((L, Dp // 2, 3 * Dp)), full((L, 1, 3 * Dp)), full((L, 1, 3 * Dp)),
            full((L, Dp // 2, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
            full((L, 4, Dp)),
            full((L, Dp // 2, Hcols)), full((L, 1, Hcols)), full((L, 1, Hcols)),
            full((L, Hcols // 2, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * L * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + L * (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=L * B * (heads * Np * Np + Np * Hcols),
        ),
        interpret=interpret,
    )(y, w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_forward_multiblock_w4(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                              layers_per_kernel: int = 6, bt: int = 4,
                              gelu_tanh: bool = True, tight: bool = True,
                              conv_embed: bool = True,
                              interpret: bool | None = None) -> jnp.ndarray:
    """Weight-only INT4 forward on stacked multi-layer kernels."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    chunks = packed.get("_chunks")
    if chunks is None:
        chunks = stack_vit_blocks_w4(packed, layers_per_kernel)
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in chunks:
        y = vit_multiblock_fused_w4(y, w, n_valid=N, d_valid=D,
                                    heads=cfg.heads, hd=hd, bt=bt,
                                    gelu_tanh=gelu_tanh, interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


# ---------------------------------------------------------------------------
# W4A8 fused block: int4 weights on the int8 MXU rate
# ---------------------------------------------------------------------------

def _dot_w4a8(xq, wp, s, b):
    """xq int8 [rows, K] @ halves-packed int4 weight [K/2, N]: unpack the
    nibbles to int8 in-register and run both halves as int8 MXU dots with
    int32 accumulation — the W8 kernel's rate at half its weight bytes.
    s folds act_scale * w_scale per column (same epilogue contract as
    _block_kernel_w8)."""
    Kh = wp.shape[0]
    wp = wp.astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
    acc = jax.lax.dot(xq[:, :Kh], lo, preferred_element_type=jnp.int32)
    acc = acc + jax.lax.dot(xq[:, Kh:], hi, preferred_element_type=jnp.int32)
    return acc.astype(jnp.float32) * s + b


def _block_kernel_w4a8(y_ref, inv_ref,
                       wqkv_ref, sqkv_ref, bqkv_ref,
                       wproj_ref, sproj_ref, bproj_ref,
                       ln1_ref, ln2_ref,
                       wfc1_ref, sfc1_ref, bfc1_ref,
                       wfc2_ref, sfc2_ref, bfc2_ref,
                       o_ref, attn_scr,
                       *, n_valid, d_valid, heads, hd, gelu_tanh,
                       batched_attn):
    """W4A8 variant of _block_kernel_w8: same quantized-activation flow and
    epilogue, int4-resident weights unpacked in-register."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid)
    qkv = _dot_w4a8(_quant_i8(h1, inv_ref[0, 0]), wqkv_ref[:],
                    sqkv_ref[:], bqkv_ref[:]).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    a = _dot_w4a8(_quant_i8(attn_scr[:].astype(jnp.float32), inv_ref[0, 1]),
                  wproj_ref[:], sproj_ref[:], bproj_ref[:])
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid)
    f = _dot_w4a8(_quant_i8(h2, inv_ref[0, 2]), wfc1_ref[:],
                  sfc1_ref[:], bfc1_ref[:])
    f = _gelu_f32(f, gelu_tanh)
    out = z1 + _dot_w4a8(_quant_i8(f, inv_ref[0, 3]), wfc2_ref[:],
                         sfc2_ref[:], bfc2_ref[:])
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused_w4a8(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                         n_valid: int, d_valid: int, heads: int, hd: int,
                         bt: int = 4, gelu_tanh: bool = True,
                         batched_attn: bool = True,
                         interpret: bool | None = None) -> jnp.ndarray:
    """W4A8 fused transformer block (int4 weights, int8 MXU dots)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel_w4a8, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((Dp // 2, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp // 2, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp // 2, Hcols)), full((1, Hcols)), full((1, Hcols)),
            full((Hcols // 2, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=B * heads * Np * Np + B * Np * Hcols,
        ),
        interpret=interpret,
    )(y, w["inv_act"], w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def pack_vit_blocks_w4a8(qflat: Dict[str, Any], act_scales: Dict[str, Any],
                         extras: Dict[str, Any], cfg, tight: bool = False,
                         smooth: Optional[Dict[str, Any]] = None
                         ) -> Dict[str, Any]:
    """Pack an INT4A8_PER_CHANNEL-quantized ViT for the W4A8 fused block
    kernel: int4 weights halves-packed on the padded grid, per-OC weight
    scales folded with the calibrated act scales (the W8 packer's contract
    at half the weight bytes). smooth: LN-foldable SmoothQuant vectors
    (see pack_vit_blocks_w8)."""
    from dlq_tpu.quant.quantize import dequantize, pack_int4_halves, unpack_int4

    smooth = _check_smooth_foldable(smooth)

    D = cfg.dim
    Np, Dp = vit_pads(cfg, tight)
    H = cfg.mlp_ratio * D
    Hp = _cdiv(H, 128) * 128

    def padw(a, r, c):
        return jnp.pad(jnp.asarray(a, jnp.int8),
                       ((0, r - a.shape[0]), (0, c - a.shape[1])))

    def padv(a, n, fill=0.0):
        a = jnp.zeros((0,), jnp.float32) if a is None else jnp.asarray(a, jnp.float32)
        return jnp.pad(a, (0, n - a.shape[0]), constant_values=fill)

    def site(name):
        p = qflat[name]
        qw = p["qw"]
        if qw.bits != 4 or qw.group is not None:
            raise ValueError(f"{name}: W4A8 pack needs per-OC int4 weights")
        grid = unpack_int4(qw.values, qw.shape)
        wscale = jnp.broadcast_to(jnp.asarray(qw.scale, jnp.float32),
                                  (qw.shape[-1],))
        comb = jnp.asarray(act_scales[name], jnp.float32) * wscale
        return grid, comb, p.get("b")

    blocks: List[Dict[str, jnp.ndarray]] = []
    for i in range(cfg.depth):
        g_qkv, s_qkv, b_qkv = site(f"l{i}.qkv")
        wq, wk, wv = jnp.split(g_qkv, 3, -1)
        sq, sk, sv = jnp.split(s_qkv, 3)
        bq, bk, bv = jnp.split(jnp.asarray(
            b_qkv if b_qkv is not None else jnp.zeros(3 * D), jnp.float32), 3)
        g_p, s_p, b_p = site(f"l{i}.proj")
        g_f1, s_f1, b_f1 = site(f"l{i}.fc1")
        g_f2, s_f2, b_f2 = site(f"l{i}.fc2")
        ln = _smooth_folded_ln(extras["ln"][i], smooth, i)
        inv = jnp.asarray([[1.0 / float(act_scales[f"l{i}.{s}"])
                            for s in ("qkv", "proj", "fc1", "fc2")]], jnp.float32)
        blocks.append({
            "inv_act": inv,
            "wqkv": pack_int4_halves(jnp.concatenate(
                [padw(wq, Dp, Dp), padw(wk, Dp, Dp), padw(wv, Dp, Dp)], -1)),
            "sqkv": jnp.concatenate(
                [padv(sq, Dp, 1.0), padv(sk, Dp, 1.0), padv(sv, Dp, 1.0)]
            ).reshape(1, -1),
            "bqkv": jnp.concatenate(
                [padv(bq, Dp), padv(bk, Dp), padv(bv, Dp)]).reshape(1, -1),
            "wproj": pack_int4_halves(padw(g_p, Dp, Dp)),
            "sproj": padv(s_p, Dp, 1.0).reshape(1, -1),
            "bproj": padv(b_p, Dp).reshape(1, -1),
            "ln1": jnp.stack([padv(ln["ln1"]["g"], Dp), padv(ln["ln1"]["b"], Dp)]),
            "ln2": jnp.stack([padv(ln["ln2"]["g"], Dp), padv(ln["ln2"]["b"], Dp)]),
            "wfc1": pack_int4_halves(padw(g_f1, Dp, Hp)),
            "sfc1": padv(s_f1, Hp, 1.0).reshape(1, -1),
            "bfc1": padv(b_f1, Hp).reshape(1, -1),
            "wfc2": pack_int4_halves(padw(g_f2, Hp, Dp)),
            "sfc2": padv(s_f2, Dp, 1.0).reshape(1, -1),
            "bfc2": padv(b_f2, Dp).reshape(1, -1),
        })
    patch_w = dequantize(qflat["patch"]["qw"]).astype(jnp.bfloat16)
    head_w = dequantize(qflat["head"]["qw"]).astype(jnp.float32)
    return {
        "blocks": blocks,
        "patch": {"w": patch_w,
                  "b": jnp.asarray(qflat["patch"]["b"], jnp.bfloat16)},
        "cls": jnp.asarray(extras["cls"], jnp.bfloat16),
        "pos": jnp.asarray(extras["pos"], jnp.bfloat16),
        "norm": {"g": jnp.asarray(extras["norm"]["g"], jnp.float32),
                 "b": jnp.asarray(extras["norm"]["b"], jnp.float32)},
        "head": {"w": head_w,
                 "b": jnp.asarray(qflat["head"]["b"], jnp.float32)},
    }


def vit_forward_blockfused_w4a8(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                                bt: int = 4, gelu_tanh: bool = True,
                                tight: bool = True, conv_embed: bool = True,
                                interpret: bool | None = None) -> jnp.ndarray:
    """W4A8 fused-block forward: the W8A8 deploy flow with int4-resident
    block weights (half the weight HBM/VMEM)."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused_w4a8(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                                 hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                                 interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


def _multiblock_kernel_w4a8(y_ref, inv_ref,
                            wqkv_ref, sqkv_ref, bqkv_ref,
                            wproj_ref, sproj_ref, bproj_ref, ln_ref,
                            wfc1_ref, sfc1_ref, bfc1_ref,
                            wfc2_ref, sfc2_ref, bfc2_ref,
                            o_ref, attn_scr,
                            *, L, n_valid, d_valid, heads, hd, gelu_tanh,
                            batched_attn):
    """L stacked W4A8 layers per kernel: residual VMEM-resident, int4
    weight stacks leading-dim indexed, int8 MXU dots."""
    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    xf = y_ref[:].reshape(rows, Dp).astype(jnp.float32)
    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    for l in range(L):
        ln = ln_ref[l].astype(jnp.float32)
        h1 = _ln_f32(xf, ln[0:1], ln[1:2], d_valid)
        qkv = _dot_w4a8(_quant_i8(h1, inv_ref[l, 0]), wqkv_ref[l],
                        sqkv_ref[l], bqkv_ref[l]).astype(jnp.bfloat16)
        mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
             n_valid=n_valid)
        a = _dot_w4a8(_quant_i8(attn_scr[:].astype(jnp.float32), inv_ref[l, 1]),
                      wproj_ref[l], sproj_ref[l], bproj_ref[l])
        z1 = xf + a
        h2 = _ln_f32(z1, ln[2:3], ln[3:4], d_valid)
        f = _dot_w4a8(_quant_i8(h2, inv_ref[l, 2]), wfc1_ref[l],
                      sfc1_ref[l], bfc1_ref[l])
        f = _gelu_f32(f, gelu_tanh)
        xf = z1 + _dot_w4a8(_quant_i8(f, inv_ref[l, 3]), wfc2_ref[l],
                            sfc2_ref[l], bfc2_ref[l])
    o_ref[:] = xf.astype(o_ref.dtype).reshape(Bt, Np, Dp)


def stack_vit_blocks_w4a8(packed: Dict[str, Any], layers_per_kernel: int
                          ) -> List[Dict[str, jnp.ndarray]]:
    """Stacked chunks for the W4A8 multi-layer kernel."""
    return _stack_blocks(packed, layers_per_kernel, with_inv=True)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_multiblock_fused_w4a8(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                              n_valid: int, d_valid: int, heads: int, hd: int,
                              bt: int = 8, gelu_tanh: bool = True,
                              batched_attn: bool = True,
                              interpret: bool | None = None) -> jnp.ndarray:
    """One stacked chunk (L layers) of W4A8 transformer blocks."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    L = w["wqkv"].shape[0]
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _multiblock_kernel_w4a8, L=L, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((L, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((L, Dp // 2, 3 * Dp)), full((L, 1, 3 * Dp)), full((L, 1, 3 * Dp)),
            full((L, Dp // 2, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
            full((L, 4, Dp)),
            full((L, Dp // 2, Hcols)), full((L, 1, Hcols)), full((L, 1, Hcols)),
            full((L, Hcols // 2, Dp)), full((L, 1, Dp)), full((L, 1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[pltpu.VMEM((bt * Np, Dp), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * L * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * L * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + L * (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=L * B * (heads * Np * Np + Np * Hcols),
        ),
        interpret=interpret,
    )(y, w["inv"], w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_forward_multiblock_w4a8(packed: Dict[str, Any], x: jnp.ndarray, cfg,
                                layers_per_kernel: int = 6, bt: int = 8,
                                gelu_tanh: bool = True, tight: bool = True,
                                conv_embed: bool = True,
                                interpret: bool | None = None) -> jnp.ndarray:
    """W4A8 forward on stacked multi-layer kernels."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    chunks = packed.get("_chunks")
    if chunks is None:
        chunks = stack_vit_blocks_w4a8(packed, layers_per_kernel)
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in chunks:
        y = vit_multiblock_fused_w4a8(y, w, n_valid=N, d_valid=D,
                                      heads=cfg.heads, hd=hd, bt=bt,
                                      gelu_tanh=gelu_tanh,
                                      interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


def _unpack_halves_i8(wp):
    """Halves-packed uint8 [K/2, N] -> (lo, hi) int8 halves."""
    wp = wp.astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
    return lo, hi


def _block_kernel_w4a8c(y_ref, inv_ref,
                        wqkv_ref, sqkv_ref, bqkv_ref,
                        wproj_ref, sproj_ref, bproj_ref,
                        ln1_ref, ln2_ref,
                        wfc1_ref, sfc1_ref, bfc1_ref,
                        wfc2_ref, sfc2_ref, bfc2_ref,
                        o_ref, attn_scr, qkv_scr, proj_scr, f1_scr, f2_scr,
                        *, n_valid, d_valid, heads, hd, gelu_tanh,
                        batched_attn):
    """W4A8 with the unpack CACHED: the weight blocks are grid-constant, so
    the in-register nibble unpack runs once (grid step 0) into int8 VMEM
    scratches and every later batch-group reuses them — the HBM stream
    stays int4, the per-step VPU cost drops to ~1/(B/bt) of the uncached
    kernel's. Scratch cost = the full int8 weights (~0.4 MB/layer for
    DeiT-Ti)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for wref, scr in ((wqkv_ref, qkv_scr), (wproj_ref, proj_scr),
                          (wfc1_ref, f1_scr), (wfc2_ref, f2_scr)):
            Kh = wref.shape[0]
            lo, hi = _unpack_halves_i8(wref[:])
            scr[:Kh, :] = lo
            scr[Kh:, :] = hi

    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    def dot8(xq, scr, s_ref, b_ref):
        acc = jax.lax.dot(xq, scr[:], preferred_element_type=jnp.int32)
        return acc.astype(jnp.float32) * s_ref[:] + b_ref[:]

    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid)
    qkv = dot8(_quant_i8(h1, inv_ref[0, 0]), qkv_scr, sqkv_ref,
               bqkv_ref).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    a = dot8(_quant_i8(attn_scr[:].astype(jnp.float32), inv_ref[0, 1]),
             proj_scr, sproj_ref, bproj_ref)
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid)
    f = dot8(_quant_i8(h2, inv_ref[0, 2]), f1_scr, sfc1_ref, bfc1_ref)
    f = _gelu_f32(f, gelu_tanh)
    out = z1 + dot8(_quant_i8(f, inv_ref[0, 3]), f2_scr, sfc2_ref, bfc2_ref)
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused_w4a8c(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                          n_valid: int, d_valid: int, heads: int, hd: int,
                          bt: int = 8, gelu_tanh: bool = True,
                          batched_attn: bool = True,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Cache-unpack W4A8 fused block (see _block_kernel_w4a8c)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel_w4a8c, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4), lambda i: (0, 0), memory_space=pltpu.SMEM),
            full((Dp // 2, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp // 2, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp // 2, Hcols)), full((1, Hcols)), full((1, Hcols)),
            full((Hcols // 2, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * Np, Dp), jnp.bfloat16),
            pltpu.VMEM((Dp, 3 * Dp), jnp.int8),
            pltpu.VMEM((Dp, Dp), jnp.int8),
            pltpu.VMEM((Dp, Hcols), jnp.int8),
            pltpu.VMEM((Hcols, Dp), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),  # scratch carries across steps
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=B * heads * Np * Np + B * Np * Hcols,
        ),
        interpret=interpret,
    )(y, w["inv_act"], w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_forward_blockfused_w4a8c(packed, x, cfg, bt: int = 8,
                                 gelu_tanh: bool = True, tight: bool = True,
                                 conv_embed: bool = True,
                                 interpret: bool | None = None):
    """W4A8 forward on the cache-unpack kernel."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused_w4a8c(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                                  hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                                  interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]


def _unpack_halves_bf16(wp):
    wp = wp.astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.bfloat16)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.bfloat16)
    return lo, hi


def _block_kernel_w4c(y_ref,
                      wqkv_ref, sqkv_ref, bqkv_ref,
                      wproj_ref, sproj_ref, bproj_ref,
                      ln1_ref, ln2_ref,
                      wfc1_ref, sfc1_ref, bfc1_ref,
                      wfc2_ref, sfc2_ref, bfc2_ref,
                      o_ref, attn_scr, qkv_scr, proj_scr, f1_scr, f2_scr,
                      *, n_valid, d_valid, heads, hd, gelu_tanh,
                      batched_attn):
    """W4A16 with the unpack cached (bf16 nibble scratches filled at grid
    step 0, reused by every batch group — see _block_kernel_w4a8c)."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        for wref, scr in ((wqkv_ref, qkv_scr), (wproj_ref, proj_scr),
                          (wfc1_ref, f1_scr), (wfc2_ref, f2_scr)):
            Kh = wref.shape[0]
            lo, hi = _unpack_halves_bf16(wref[:])
            scr[:Kh, :] = lo
            scr[Kh:, :] = hi

    Bt, Np, Dp = y_ref.shape
    rows = Bt * Np
    x = y_ref[:].reshape(rows, Dp)
    xf = x.astype(jnp.float32)

    def dotw(xb, scr, s_ref, b_ref):
        acc = jax.lax.dot(xb, scr[:], preferred_element_type=jnp.float32)
        return acc * s_ref[:] + b_ref[:]

    ln1 = ln1_ref[:].astype(jnp.float32)
    h1 = _ln_f32(xf, ln1[0:1], ln1[1:2], d_valid).astype(jnp.bfloat16)
    qkv = dotw(h1, qkv_scr, sqkv_ref, bqkv_ref).astype(jnp.bfloat16)

    mhsa = _mhsa_batched_into_scratch if batched_attn else _mhsa_into_scratch
    mhsa(qkv, attn_scr, Bt=Bt, Np=Np, Dp=Dp, heads=heads, hd=hd,
         n_valid=n_valid)

    a = dotw(attn_scr[:], proj_scr, sproj_ref, bproj_ref)
    z1 = xf + a

    ln2 = ln2_ref[:].astype(jnp.float32)
    h2 = _ln_f32(z1, ln2[0:1], ln2[1:2], d_valid).astype(jnp.bfloat16)
    f = dotw(h2, f1_scr, sfc1_ref, bfc1_ref)
    f = _gelu_f32(f, gelu_tanh).astype(jnp.bfloat16)
    out = z1 + dotw(f, f2_scr, sfc2_ref, bfc2_ref)
    o_ref[:] = out.astype(o_ref.dtype).reshape(Bt, Np, Dp)


@functools.partial(jax.jit, static_argnames=(
    "n_valid", "d_valid", "heads", "hd", "bt", "gelu_tanh", "batched_attn",
    "interpret"))
def vit_block_fused_w4c(y: jnp.ndarray, w: Dict[str, jnp.ndarray], *,
                        n_valid: int, d_valid: int, heads: int, hd: int,
                        bt: int = 8, gelu_tanh: bool = True,
                        batched_attn: bool = True,
                        interpret: bool | None = None) -> jnp.ndarray:
    """Cache-unpack W4A16 fused block."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    B, Np, Dp = y.shape
    while B % bt:
        bt //= 2
    Hcols = w["wfc1"].shape[-1]
    kernel = functools.partial(
        _block_kernel_w4c, n_valid=n_valid, d_valid=d_valid,
        heads=heads, hd=hd, gelu_tanh=gelu_tanh, batched_attn=batched_attn,
    )
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B // bt,),
        in_specs=[
            pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            full((Dp // 2, 3 * Dp)), full((1, 3 * Dp)), full((1, 3 * Dp)),
            full((Dp // 2, Dp)), full((1, Dp)), full((1, Dp)),
            full((2, Dp)), full((2, Dp)),
            full((Dp // 2, Hcols)), full((1, Hcols)), full((1, Hcols)),
            full((Hcols // 2, Dp)), full((1, Dp)), full((1, Dp)),
        ],
        out_specs=pl.BlockSpec((bt, Np, Dp), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, Np, Dp), y.dtype),
        scratch_shapes=[
            pltpu.VMEM((bt * Np, Dp), jnp.bfloat16),
            pltpu.VMEM((Dp, 3 * Dp), jnp.bfloat16),
            pltpu.VMEM((Dp, Dp), jnp.bfloat16),
            pltpu.VMEM((Dp, Hcols), jnp.bfloat16),
            pltpu.VMEM((Hcols, Dp), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * Np * Dp * (3 * Dp + Dp + 2 * Hcols)
            + 4 * B * heads * Np * Np * hd,
            bytes_accessed=2 * B * Np * Dp * 2
            + (4 * Dp * Dp + 2 * Dp * Hcols) // 2,
            transcendentals=B * heads * Np * Np + B * Np * Hcols,
        ),
        interpret=interpret,
    )(y, w["wqkv"], w["sqkv"], w["bqkv"],
      w["wproj"], w["sproj"], w["bproj"], w["ln1"], w["ln2"],
      w["wfc1"], w["sfc1"], w["bfc1"], w["wfc2"], w["sfc2"], w["bfc2"])


def vit_forward_blockfused_w4c(packed, x, cfg, bt: int = 8,
                               gelu_tanh: bool = True, tight: bool = True,
                               conv_embed: bool = True,
                               interpret: bool | None = None):
    """W4A16 forward on the cache-unpack kernel."""
    from dlq_tpu.models.vit import layernorm

    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight)
    B = x.shape[0]
    y = embed_tokens(packed, x, cfg, conv_embed=conv_embed)
    cls = jnp.broadcast_to(packed["cls"], (B, 1, D)).astype(jnp.bfloat16)
    y = jnp.concatenate([cls, y], axis=1) + packed["pos"]
    y = jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))
    for w in packed["blocks"]:
        y = vit_block_fused_w4c(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                                hd=hd, bt=bt, gelu_tanh=gelu_tanh,
                                interpret=interpret)
    hf = layernorm(y[:, 0, :D].astype(jnp.float32), packed["norm"])
    return jnp.dot(hf, packed["head"]["w"],
                   preferred_element_type=jnp.float32) + packed["head"]["b"]

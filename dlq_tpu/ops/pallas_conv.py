"""Pallas TPU kernel: fused W8A8 3x3 stride-1 SAME conv (implicit GEMM).

The reference lowered every conv to materialized im2col + SGEMM and measured
the 65 ms cliff (`reports/Step2.md:106-118`). The TPU-native answer keeps the
column matrix virtual: each program DMAs one spatially-haloed int8 slab from
HBM into VMEM and accumulates nine [rows, C] x [C, OC] MXU matmuls — one per
filter tap — over static in-register shifted views of the slab. int32
accumulation, fp32 per-OC rescale + bias + relu epilogue, all fused.

Covers the stride-1 3x3 body convs that carry most ResNet FLOPs; 1x1 convs
are plain matmuls (`pallas_matmul.int8_matmul`), strided/7x7 stem stays on
XLA's conv.

STATUS (v5e, measured): bit-exact vs XLA's int8 conv at model level, but
NOT yet faster — the per-program halo DMA is issued and awaited serially
(no double buffering), so the kernel reaches 19-40% of int8 peak vs XLA
conv's fused pipeline. XLA conv remains the production deploy path
(DeployCtx); this kernel is the foundation for a double-buffered /
prefetching variant. Known Mosaic constraints worked around here: slab W
(second-to-minor) must be a multiple of 8, channel (lane) dim >= 128, no
intermediates with tiny sublane dims.

Grid: (N / TB, OH / TOH, OC / TOC); halo windows overlap in H, which
BlockSpec index maps cannot express, so the input stays in HBM/ANY and the
kernel issues its own async copy per program (double-buffering left to the
grid pipeline for outputs/weights).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tiles(N: int, OH: int, OW: int, C: int, OC: int):
    """Choose (TB, TOH, TOC): rows = TB*TOH*OW around 512-2048, VMEM-safe."""
    # VMEM budget for slab: TB*(TOH+2)*(OW+2)*C int8 <= ~4MB
    def slab_bytes(tb, toh):
        return tb * (toh + 2) * (OW + 2) * C

    TB, TOH = 1, OH
    # grow TOH down / TB up for small spatial dims; target ~2-3k GEMM rows
    # per program to amortize the per-program overhead (VMEM has headroom)
    target_rows = 2048
    if OH * OW >= target_rows:
        TOH = max(1, min(OH, target_rows // OW))
        while OH % TOH != 0:
            TOH -= 1
        TB = 1
    else:
        TB = max(1, target_rows // (OH * OW))
        while N % TB != 0:
            TB -= 1
        TOH = OH
    while slab_bytes(TB, TOH) > 4 * 1024 * 1024 and TOH > 1:
        TOH = max(1, TOH // 2)
        while OH % TOH != 0:
            TOH -= 1
    TOC = min(OC, 256)
    while OC % TOC != 0:
        TOC //= 2
    return TB, TOH, TOC


def _conv_kernel(xp_hbm, w_ref, scale_ref, bias_ref, o_ref, xs, acc_ref, sem,
                 *, TB, TOH, OW, C, TOC, fuse_relu, flat_dot):
    n = pl.program_id(0)
    t = pl.program_id(1)
    j = pl.program_id(2)
    n_t = pl.num_programs(1)
    n_j = pl.num_programs(2)
    # linear (n, t) index; programs execute sequentially in grid order with
    # j innermost, so the slab for (n, t) serves all j steps and the NEXT
    # (n, t) slab can prefetch into the alternate slot during compute
    nt = n * n_t + t
    n_nt = pl.num_programs(0) * n_t
    slot = jax.lax.rem(nt, 2)
    next_slot = jax.lax.rem(nt + 1, 2)

    def slab_dma(nt_idx, slot_idx):
        nn = nt_idx // n_t
        tt = jax.lax.rem(nt_idx, n_t)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(nn * TB, TB), pl.ds(tt * TOH, TOH + 2), :, :],
            xs.at[slot_idx],
            sem.at[slot_idx],
        )

    @pl.when(jnp.logical_and(nt == 0, j == 0))
    def _():  # cold start: fetch the first slab
        slab_dma(0, 0).start()

    @pl.when(jnp.logical_and(j == 0, nt + 1 < n_nt))
    def _():  # prefetch the next (n, t) slab while this block computes
        slab_dma(nt + 1, next_slot).start()

    @pl.when(j == 0)
    def _():  # first j-step of this (n, t): ensure our slab has landed
        slab_dma(nt, slot).wait()

    slab = xs[slot]  # [TB, TOH+2, OW+2, C] int8
    if flat_dot:
        # 2D dots over reshaped shifted views (needs Mosaic relayout of the
        # strided slices; fastest when it compiles)
        rows = TB * TOH * OW
        acc = jnp.zeros((rows, TOC), jnp.int32)
        for kh in range(3):
            for kw in range(3):
                a = slab[:, kh : kh + TOH, kw : kw + OW, :].reshape(rows, C)
                acc += jax.lax.dot(a, w_ref[kh * 3 + kw], preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y.reshape(TB, TOH, OW, TOC)
    else:
        # reshape-free: 4D dot_general contracting the channel dim; the
        # output block keeps its natural [TB, TOH, OW, TOC] layout
        acc = jnp.zeros((TB, TOH, OW, TOC), jnp.int32)
        for kh in range(3):
            for kw in range(3):
                a = slab[:, kh : kh + TOH, kw : kw + OW, :]
                acc += jax.lax.dot_general(
                    a, w_ref[kh * 3 + kw],
                    dimension_numbers=(((3,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
        y = acc.astype(jnp.float32) * scale_ref[0] + bias_ref[0]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y
    del acc_ref  # accumulation fits in registers for 9 taps; scratch unused


@functools.partial(
    jax.jit, static_argnames=("fuse_relu", "interpret", "tiles", "flat_dot", "input_hbm")
)
def int8_conv3x3_s1(
    x: jnp.ndarray,  # [N, H, W, C] int8 (UNpadded)
    w: jnp.ndarray,  # [3, 3, C, OC] int8
    scale: jnp.ndarray,  # (OC,) fp32 combined act*weight scale
    bias: Optional[jnp.ndarray] = None,  # (OC,) fp32
    fuse_relu: bool = False,
    interpret: bool | None = None,
    tiles=None,  # optional explicit (TB, TOH, TOC)
    flat_dot: bool = True,  # 2D-reshape dots vs reshape-free 4D dot_general
    input_hbm: bool = True,  # pin the padded input to HBM (ANY may pick VMEM
                             # and blow the budget for mid-size activations)
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, H, W_, C = x.shape
    kh, kw, C2, OC = w.shape
    assert (kh, kw) == (3, 3) and C2 == C, (w.shape, x.shape)
    OH, OW = H, W_
    # pad the slab's W dim (scratch second-to-minor) up to a sublane multiple
    # of 8, and the channel (lane) dim up to 128 — non-conforming shapes
    # crash the Mosaic DMA/tiling path (found empirically; the compile
    # helper dies without an error message)
    WP = -(-(OW + 2) // 8) * 8
    CP = max(C, 128) if C < 128 else C
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, WP - OW - 1), (0, CP - C)))
    if CP != C:
        w = jnp.pad(w, ((0, 0), (0, 0), (0, CP - C), (0, 0)))
    C = CP
    TB, TOH, TOC = tiles if tiles is not None else _pick_tiles(N, OH, OW, C, OC)
    assert N % TB == 0 and OH % TOH == 0 and OC % TOC == 0, (N, OH, OC, TB, TOH, TOC)
    if bias is None:
        bias = jnp.zeros((OC,), jnp.float32)
    w9 = w.reshape(9, C, OC)
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (OC,)).reshape(1, OC)
    bias2 = bias.astype(jnp.float32).reshape(1, OC)

    grid = (N // TB, OH // TOH, OC // TOC)
    return pl.pallas_call(
        functools.partial(
            _conv_kernel, TB=TB, TOH=TOH, OW=OW, C=C, TOC=TOC,
            fuse_relu=fuse_relu, flat_dot=flat_dot,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM if input_hbm else pltpu.ANY),
            pl.BlockSpec((9, C, TOC), lambda n, t, j: (0, 0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TOC), lambda n, t, j: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TOC), lambda n, t, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, TOH, OW, TOC), lambda n, t, j: (n, t, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((N, OH, OW, OC), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, TB, TOH + 2, WP, C), jnp.int8),  # double-buffered slabs
            pltpu.VMEM((8, 128), jnp.int32),  # placeholder scratch
            pltpu.SemaphoreType.DMA((2,)),  # per-slot completion semaphores
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * OW * OC * C * 9,
            bytes_accessed=N * H * W_ * C + 9 * C * OC + 4 * N * OH * OW * OC,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w9, scale2, bias2)


# ---------------------------------------------------------------------------
# Dual-pixel packed conv: the C=64 (layer1) lane-underfill fix
# ---------------------------------------------------------------------------
#
# XLA's int8 conv runs ResNet layer1 shapes (56x56, C=OC=64) at ~50% of the
# MXU peak: both the contraction (C=64) and output (OC=64) dims half-fill
# the 128-lane systolic array. This kernel reshapes W-adjacent pixel PAIRS
# into channels — x[N,H,W,64] -> x[N,H,W/2,128] is a FREE row-major
# reinterpretation — so the 3x3 conv becomes SIX [K=128 x N=128] full-tile
# MXU taps per output pair block:
#
#   out col 2m+q = sum_kw w[kh,kw] * in[2m + q + kw - 1]
#   packed in col 2w'-1+p at pair w' = m+d  ->  kw = 2d + p - q
#
# giving taps d in {0,1} with weights w6[kh*2+d, (p,c), (q,oc)] that are 3/4
# dense (kw outside 0..2 zeroes the entry). Useful-MAC fraction = 9/12 = 75%
# of a FULL-lane MXU stream vs XLA's 50% half-lane stream — a ~1.5x
# theoretical ceiling on the shape class, with the epilogue (per-OC rescale
# + bias + relu + optional int8 requant for the fully-int8 interchange)
# fused. Measured numbers in BENCH_NOTES ("dual-pixel conv").
#
# Reference parity note: this replaces the reference's im2col+SGEMM conv
# pipeline (`CUDA/resnet18-kernel-lab/cpp/fp32/kernels/im2col.cu:6-57`,
# `kernels/sgemm_tiled.cu:6-46`) on the one shape class where XLA's own
# conv leaves MXU throughput on the table.


def pack_w_dual(w: jnp.ndarray) -> jnp.ndarray:
    """[3,3,C,OC] int8 -> [6, 2C, 2OC] dual-pixel tap weights.

    jnp-traceable (block concat), so deploy ctxs can pack per-forward — six
    concats on a 64 KB weight are free next to the conv itself."""
    kh3, kw3, C, OC = w.shape
    assert (kh3, kw3) == (3, 3), w.shape
    z = jnp.zeros((C, OC), w.dtype)
    taps = []
    for kh in range(3):
        for d in range(2):
            # block [(p, q)] = w[kh, 2d + p - q] if the kw is in 0..2
            def blk(p, q):
                kw = 2 * d + p - q
                return w[kh, kw] if 0 <= kw <= 2 else z
            taps.append(jnp.concatenate([
                jnp.concatenate([blk(0, 0), blk(0, 1)], axis=1),
                jnp.concatenate([blk(1, 0), blk(1, 1)], axis=1),
            ], axis=0))
    return jnp.stack(taps)


def _dp_kernel(xp_hbm, w_ref, scale_ref, bias_ref, oscale_ref, o_ref, xs, sem,
               *, TB, TOH, WQ, WPP, CP, fuse_relu, out_int8, nbuf):
    n = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    nt = n * n_t + t
    n_nt = pl.num_programs(0) * n_t
    slot = jax.lax.rem(nt, nbuf)

    def slab_dma(nt_idx, slot_idx):
        nn = nt_idx // n_t
        tt = jax.lax.rem(nt_idx, n_t)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(nn * TB, TB), pl.ds(tt * TOH, TOH + 2), :, :],
            xs.at[slot_idx],
            sem.at[slot_idx],
        )

    @pl.when(nt == 0)
    def _():  # cold start: fill the whole pipeline window
        for k in range(nbuf - 1):
            @pl.when(k < n_nt)
            def _(k=k):
                slab_dma(k, k).start()

    @pl.when(nt + nbuf - 1 < n_nt)
    def _():  # keep the window nbuf-1 DMAs deep
        slab_dma(nt + nbuf - 1, jax.lax.rem(nt + nbuf - 1, nbuf)).start()

    slab_dma(nt, slot).wait()
    slab = xs[slot]  # [TB, TOH+2, WPP, CP] int8, CP = 2C
    rows = TB * TOH * WQ
    acc = jnp.zeros((rows, w_ref.shape[-1]), jnp.int32)
    for kh in range(3):
        for d in range(2):
            a = slab[:, kh : kh + TOH, d : d + WQ, :].reshape(rows, CP)
            acc += jax.lax.dot(a, w_ref[kh * 2 + d],
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if fuse_relu:
        y = jnp.maximum(y, 0.0)
    if out_int8:
        # divide (not multiply-by-reciprocal): bit-parity with the XLA
        # deploy epilogue `round(y / s_out)`
        q = jnp.clip(jnp.round(y / oscale_ref[:]),
                     0.0 if fuse_relu else -127.0, 127.0)
        o_ref[:] = q.astype(jnp.int8).reshape(o_ref.shape)
    else:
        o_ref[:] = y.reshape(o_ref.shape)


@functools.partial(
    jax.jit,
    static_argnames=("fuse_relu", "out_int8", "interpret", "tiles", "nbuf"),
)
def int8_conv3x3_s1_dp(
    x: jnp.ndarray,       # [N, H, W, C] int8 (unpadded), W even, C = 64
    w6: jnp.ndarray,      # [6, 2C, 2OC] int8 (pack_w_dual)
    scale: jnp.ndarray,   # (OC,) fp32 combined act*weight scale
    bias: Optional[jnp.ndarray] = None,   # (OC,) fp32
    out_scale: Optional[jnp.ndarray] = None,  # () fp32: emit int8 at y/out_scale
    fuse_relu: bool = False,
    out_int8: bool = False,
    interpret: bool | None = None,
    tiles=None,  # (TB, TOH)
    nbuf: int = 4,  # slab pipeline depth (DMA-latency hiding)
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, H, W_, CP2 = x.shape
    C = CP2
    n6, CP, OC2 = w6.shape
    assert n6 == 6 and CP == 2 * C, (w6.shape, x.shape)
    OC = OC2 // 2
    assert W_ % 2 == 0, x.shape
    OH, OW = H, W_
    WQ = W_ // 2                      # output pairs per row
    WPAIR = WQ + 1                    # input pairs incl. the -1/+0 halo
    WPP = -(-WPAIR // 8) * 8          # sublane multiple of 8
    # pack: pad cols by 1 each side, pair-merge (free reshape), pad H halo
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + 2 * (WPP - WPAIR)), (0, 0)))
    xp = xpad.reshape(N, H + 2, WPP, CP)

    if tiles is None:
        TB, TOH = 1, OH
        while TB * (TOH + 2) * WPP * CP > 4 * 1024 * 1024 and TOH > 1:
            TOH = max(1, TOH // 2)
        while OH % TOH != 0:
            TOH -= 1
    else:
        TB, TOH = tiles
    assert N % TB == 0 and OH % TOH == 0, (N, OH, TB, TOH)

    if bias is None:
        bias = jnp.zeros((OC,), jnp.float32)
    scale2 = jnp.tile(jnp.broadcast_to(scale.astype(jnp.float32), (OC,)), 2).reshape(1, 2 * OC)
    bias2 = jnp.tile(bias.astype(jnp.float32), 2).reshape(1, 2 * OC)
    if out_scale is None:
        oscale2 = jnp.ones((1, 2 * OC), jnp.float32)
    else:
        oscale2 = jnp.broadcast_to(
            out_scale.astype(jnp.float32), (1, 2 * OC))

    grid = (N // TB, OH // TOH)
    out = pl.pallas_call(
        functools.partial(
            _dp_kernel, TB=TB, TOH=TOH, WQ=WQ, WPP=WPP, CP=CP,
            fuse_relu=fuse_relu, out_int8=out_int8, nbuf=nbuf,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((6, CP, 2 * OC), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, TOH, WQ, 2 * OC), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N, OH, WQ, 2 * OC), jnp.int8 if out_int8 else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, TB, TOH + 2, WPP, CP), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * WQ * 2 * OC * CP * 6,
            bytes_accessed=N * (H + 2) * WPP * CP + 6 * CP * 2 * OC
            + (1 if out_int8 else 4) * N * OH * OW * OC,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w6, scale2, bias2, oscale2)
    # unpack the (q, oc) lane pairs back to columns: free row-major reshape
    return out.reshape(N, OH, OW, OC)


# --- dp2: full-slab variant (no unaligned in-kernel sublane slices) -------
#
# The dp kernel's per-tap A views slice the slab's sublane (pair) dim at
# offsets 0/1 and merge into GEMM rows; if Mosaic lowers each unaligned
# slice+merge as a relayout COPY of the slab, the kernel is VPU-copy-bound
# regardless of DMA depth. dp2 removes every W-dim slice from the compute:
# each program DMAs TWO pre-shifted slabs (pair offsets 0 and 1) and runs
# the 6 taps on FULL [TB, TOH, WQP, CP] views (kh slices are above the
# tiled dims — free), computing WQP-padded garbage columns that the output
# write drops. +WQP/WQ extra MACs (~14% at 56x56) for slice-free lowering.


def _dp2_kernel(xp_hbm, w_ref, scale_ref, bias_ref, oscale_ref, o_ref, xs, sem,
                *, TB, TOH, WQ, WQP, CP, fuse_relu, out_int8, nbuf):
    n = pl.program_id(0)
    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    nt = n * n_t + t
    n_nt = pl.num_programs(0) * n_t
    slot = jax.lax.rem(nt, nbuf)

    def slab_dma(nt_idx, slot_idx, d):
        nn = nt_idx // n_t
        tt = jax.lax.rem(nt_idx, n_t)
        return pltpu.make_async_copy(
            xp_hbm.at[pl.ds(nn * TB, TB), pl.ds(tt * TOH, TOH + 2),
                      pl.ds(d, WQP), :],
            xs.at[slot_idx, d],
            sem.at[slot_idx, d],
        )

    @pl.when(nt == 0)
    def _():
        for k in range(nbuf - 1):
            @pl.when(k < n_nt)
            def _(k=k):
                slab_dma(k, k, 0).start()
                slab_dma(k, k, 1).start()

    @pl.when(nt + nbuf - 1 < n_nt)
    def _():
        nxt = jax.lax.rem(nt + nbuf - 1, nbuf)
        slab_dma(nt + nbuf - 1, nxt, 0).start()
        slab_dma(nt + nbuf - 1, nxt, 1).start()

    slab_dma(nt, slot, 0).wait()
    slab_dma(nt, slot, 1).wait()
    rows = TB * TOH * WQP
    acc = jnp.zeros((rows, w_ref.shape[-1]), jnp.int32)
    for kh in range(3):
        for d in range(2):
            a = xs[slot, d, :, kh : kh + TOH, :, :].reshape(rows, CP)
            acc += jax.lax.dot(a, w_ref[kh * 2 + d],
                               preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * scale_ref[:] + bias_ref[:]
    if fuse_relu:
        y = jnp.maximum(y, 0.0)
    if out_int8:
        q = jnp.clip(jnp.round(y / oscale_ref[:]),
                     0.0 if fuse_relu else -127.0, 127.0).astype(jnp.int8)
        o_ref[:] = q.reshape(TB, TOH, WQP, -1)[:, :, :WQ, :]
    else:
        o_ref[:] = y.reshape(TB, TOH, WQP, -1)[:, :, :WQ, :]


@functools.partial(
    jax.jit,
    static_argnames=("fuse_relu", "out_int8", "interpret", "tiles", "nbuf"),
)
def int8_conv3x3_s1_dp2(
    x: jnp.ndarray,
    w6: jnp.ndarray,
    scale: jnp.ndarray,
    bias: Optional[jnp.ndarray] = None,
    out_scale: Optional[jnp.ndarray] = None,
    fuse_relu: bool = False,
    out_int8: bool = False,
    interpret: bool | None = None,
    tiles=None,
    nbuf: int = 4,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    N, H, W_, C = x.shape
    n6, CP, OC2 = w6.shape
    assert n6 == 6 and CP == 2 * C and W_ % 2 == 0, (w6.shape, x.shape)
    OC = OC2 // 2
    OH, OW = H, W_
    WQ = W_ // 2
    WQP = -(-WQ // 8) * 8            # full-slab width per tap (8-mult)
    WPP = WQP + 8                    # pairs incl. both tap offsets, 8-mult
    xpad = jnp.pad(x, ((0, 0), (1, 1), (1, 2 * WPP - W_ - 1), (0, 0)))
    xp = xpad.reshape(N, H + 2, WPP, CP)

    if tiles is None:
        TB, TOH = 1, OH
    else:
        TB, TOH = tiles
    assert N % TB == 0 and OH % TOH == 0, (N, OH, TB, TOH)
    if bias is None:
        bias = jnp.zeros((OC,), jnp.float32)
    scale2 = jnp.tile(jnp.broadcast_to(scale.astype(jnp.float32), (OC,)), 2).reshape(1, 2 * OC)
    bias2 = jnp.tile(bias.astype(jnp.float32), 2).reshape(1, 2 * OC)
    oscale2 = (jnp.ones((1, 2 * OC), jnp.float32) if out_scale is None
               else jnp.broadcast_to(out_scale.astype(jnp.float32), (1, 2 * OC)))

    grid = (N // TB, OH // TOH)
    out = pl.pallas_call(
        functools.partial(
            _dp2_kernel, TB=TB, TOH=TOH, WQ=WQ, WQP=WQP, CP=CP,
            fuse_relu=fuse_relu, out_int8=out_int8, nbuf=nbuf,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((6, CP, 2 * OC), lambda n, t: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2 * OC), lambda n, t: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TB, TOH, WQ, 2 * OC), lambda n, t: (n, t, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct(
            (N, OH, WQ, 2 * OC), jnp.int8 if out_int8 else jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((nbuf, 2, TB, TOH + 2, WQP, CP), jnp.int8),
            pltpu.SemaphoreType.DMA((nbuf, 2)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * N * OH * WQP * 2 * OC * CP * 6,
            bytes_accessed=2 * N * (H + 2) * WQP * CP + 6 * CP * 2 * OC
            + (1 if out_int8 else 4) * N * OH * OW * OC,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, w6, scale2, bias2, oscale2)
    return out.reshape(N, OH, OW, OC)

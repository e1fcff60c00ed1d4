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

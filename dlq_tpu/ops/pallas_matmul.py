"""Pallas TPU kernels: fused dequant + matmul.

The TPU-native replacement for the reference's `sgemm_tiled.cu` (shared-mem
tiled FP32 GEMM, `kernels/sgemm_tiled.cu:6-46`) — except the TPU version is
quantization-native: weights stay resident int8/int4 in HBM, stream through
VMEM, and dequantization happens in-register fused with the MXU matmul
(BASELINE.json north star). No fp32 weight copy ever exists.

Kernels:
  int8_matmul   — x:int8[M,K] @ w:int8[K,N] -> int32 accum -> fp32 rescale
                  (per-tensor or per-OC scale) + bias + optional relu
  int4_matmul   — x:bf16[M,K] @ unpack(w:uint8[K/2,N]) with group-wise scales
                  [K/g, N]; dequant in-register, bf16 MXU, fp32 accum

Grid is (M-tiles, N-tiles, K-tiles) with K innermost; an fp32/int32 VMEM
scratch accumulates across K steps (zeroed at k==0, epilogue at k==last).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


# ---------------------------------------------------------------------------
# W8A8 fused matmul
# ---------------------------------------------------------------------------

def _int8_mm_kernel(x_ref, w_ref, scale_ref, bias_ref, o_ref, acc_ref, *, n_k, fuse_relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(
        x_ref[:], w_ref[:], preferred_element_type=jnp.int32
    )

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * scale_ref[:]  # (1,TN) broadcast
        y = y + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("fuse_relu", "tm", "tn", "tk", "interpret")
)
def int8_matmul(
    x: jnp.ndarray,  # [M, K] int8
    w: jnp.ndarray,  # [K, N] int8
    scale: jnp.ndarray,  # [N] fp32 combined (act_scale * w_scale[oc])
    bias: Optional[jnp.ndarray] = None,  # [N] fp32
    fuse_relu: bool = False,
    tm: int = 512,
    tn: int = 1024,
    tk: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Fused W8A8 GEMM with fp32 epilogue. Shapes must tile exactly
    (engines pad params/batches to MXU-friendly sizes).

    Tile defaults are the round-5 sweep's safe pick (tk=2048: +5% over the
    old (512,1024,512) at 4096^3, falls back by halving when K doesn't
    divide). The per-shape MEASURED winners — e.g. full-K (512,512,4096)
    at 330.6 TOPS = 84% of the v5e int8 peak, +15% over the old default
    same-run — live in the autotune cache/shipped table
    (ops/tile_autotune, runlogs/r5/tiles4.jsonl) and are applied by
    int8_matmul_padded automatically."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    K2, N = w.shape
    assert K == K2, (x.shape, w.shape)
    tm, tn, tk = min(tm, M), min(tn, N), min(tk, K)
    while K % tk:
        tk //= 2  # large-tk default degrades gracefully on odd K
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    n_k = K // tk
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (N,)).reshape(1, N)
    bias2 = bias.astype(jnp.float32).reshape(1, N)

    grid = (M // tm, N // tn, n_k)
    return pl.pallas_call(
        functools.partial(_int8_mm_kernel, n_k=n_k, fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + K * N + 4 * M * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w, scale2, bias2)


def int8_matmul_padded(x, w, scale, bias=None, fuse_relu=False, tile_m=256, **kw):
    """int8_matmul with M padded up to a tile multiple (zero rows cost ~0
    and slice off); K/N must already tile (weights are pre-padded offline).

    Tile selection consults the per-shape autotune cache first
    (ops/tile_autotune, measured-once-per-device); explicit tm/tn/tk kwargs
    and the tile_m pad granule override it."""
    M = x.shape[0]
    Mp = _cdiv(M, tile_m) * tile_m
    if "tn" not in kw and "tk" not in kw:
        from dlq_tpu.ops.tile_autotune import lookup

        # fixed point on the padded M: only apply an entry whose own tm
        # reproduces the Mp it was looked up at — otherwise the tn/tk were
        # measured at a different M than the one we'd run (ADVICE r4 #4)
        Mp_try = Mp
        for _ in range(3):
            e = lookup("w8a8", Mp_try, x.shape[1], w.shape[1])
            if not (e and e.get("ms") is not None):
                break
            tm_e = min(e["tm"], Mp_try)
            Mp_e = _cdiv(M, tm_e) * tm_e
            if Mp_e == Mp_try:
                tile_m, Mp = tm_e, Mp_e
                kw = {"tn": e["tn"], "tk": e["tk"], **kw}
                break
            Mp_try = Mp_e
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    y = int8_matmul(x, w, scale, bias, fuse_relu=fuse_relu, tm=tile_m, **kw)
    return y[:M] if Mp != M else y


def int4_matmul_padded(x, w_packed, scales, bias=None, group=128,
                       fuse_relu=False, tile_m=256, **kw):
    """int4_matmul with M padded up to a tile multiple."""
    M = x.shape[0]
    Mp = _cdiv(M, tile_m) * tile_m
    if Mp != M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    y = int4_matmul(x, w_packed, scales, bias, group=group,
                    fuse_relu=fuse_relu, tm=tile_m, **kw)
    return y[:M] if Mp != M else y


def int4_shapes_ok(K: int, N: int, group: int, tn: int = 256, tk: int = 512) -> bool:
    """Can the Pallas int4 kernel handle this weight (without weight padding)?"""
    tk = tk if tk % group == 0 else group
    return K % max(tk, group) == 0 and N % min(tn, N) == 0 and N % 128 == 0


# ---------------------------------------------------------------------------
# W4A8 fused matmul (int4 weights, int8 activations, per-OC scales)
# ---------------------------------------------------------------------------

def _int4a8_mm_kernel(xe_ref, xo_ref, wp_ref, scale_ref, bias_ref, o_ref,
                      acc_ref, *, n_k, fuse_relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # split contraction (see _int4_mm_kernel): unpack nibbles to int8 and
    # run both halves as int8 MXU dots with int32 accumulation — the 2x
    # int8 rate instead of the W4A16 kernel's bf16 rate
    wp = wp_ref[:].astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo).astype(jnp.int8)
    hi = jnp.where(hi >= 8, hi - 16, hi).astype(jnp.int8)
    acc_ref[:] += jax.lax.dot(xe_ref[:], lo, preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot(xo_ref[:], hi, preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * scale_ref[:]
        y = y + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("fuse_relu", "tm", "tn", "tk", "interpret")
)
def int4a8_matmul(
    x: jnp.ndarray,  # [M, K] int8
    w_packed: jnp.ndarray,  # [K//2, N] uint8 (two nibbles per byte along K)
    scale: jnp.ndarray,  # [N] fp32 combined (act_scale * w_scale[oc])
    bias: Optional[jnp.ndarray] = None,
    fuse_relu: bool = False,
    tm: int = 1024,
    tn: int = 512,
    tk: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """W4A8 GEMM: int4-packed weights (per-OC scales) unpacked to int8
    in-register, int8 activations, int8xint8->int32 on the MXU. Weights cost
    4 bits of HBM (half of W8A8) and the dots run at the int8 rate — the
    in-register unpack is the only overhead vs int8_matmul. Per-OC weight
    scales only (group-wise would force a per-group fp32 accumulator update,
    M*N*K/group VPU FMAs — that cost lives in int4_matmul's bf16 path
    instead). Round-5 sweep (runlogs/r5/tiles5.jsonl): large-tk tiles
    (1024,512,4096) measure **215.8 TOPS at 4096^3** (55% of int8 peak;
    the old (512,1024,2048) default read 201.1 same-run) — ~65% of the
    full-K int8_matmul at half its weight bytes; non-dividing shapes
    degrade tiles gracefully by halving."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    Kh, N = w_packed.shape
    assert Kh * 2 == K, (x.shape, w_packed.shape)
    assert x.dtype == jnp.int8, x.dtype
    tm, tn = min(tm, M), min(tn, N)
    tk = min(tk, K)
    while M % tm:
        tm //= 2
    while N % tn:
        tn //= 2
    while K % tk:
        tk //= 2
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    n_k = K // tk
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (N,)).reshape(1, N)
    bias2 = bias.astype(jnp.float32).reshape(1, N)
    x3 = x.reshape(M, Kh, 2)
    xe = x3[:, :, 0]
    xo = x3[:, :, 1]

    grid = (M // tm, N // tn, n_k)
    return pl.pallas_call(
        functools.partial(_int4a8_mm_kernel, n_k=n_k, fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + Kh * N + 4 * M * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, w_packed, scale2, bias2)


def _int4a8_cached_kernel(xe_ref, xo_ref, wp_ref, scale_ref, bias_ref, o_ref,
                          acc_ref, lo_scr, hi_scr, *, n_k, tkh, fuse_relu):
    # grid is (j, i, k): for each N-tile j, the k-loop runs for every M-tile
    # i — unpack only at i == 0 into the K-spanning scratch, reuse after.
    i = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        wp = wp_ref[:].astype(jnp.int32)
        lo = wp & 0xF
        hi = (wp >> 4) & 0xF
        lo_scr[pl.ds(k * tkh, tkh), :] = jnp.where(
            lo >= 8, lo - 16, lo).astype(jnp.int8)
        hi_scr[pl.ds(k * tkh, tkh), :] = jnp.where(
            hi >= 8, hi - 16, hi).astype(jnp.int8)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(xe_ref[:], lo_scr[pl.ds(k * tkh, tkh), :],
                              preferred_element_type=jnp.int32)
    acc_ref[:] += jax.lax.dot(xo_ref[:], hi_scr[pl.ds(k * tkh, tkh), :],
                              preferred_element_type=jnp.int32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:].astype(jnp.float32) * scale_ref[:]
        y = y + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("fuse_relu", "tm", "tn", "tk", "interpret")
)
def int4a8_matmul_cached(
    x: jnp.ndarray,  # [M, K] int8
    w_packed: jnp.ndarray,  # [K//2, N] uint8
    scale: jnp.ndarray,  # [N] fp32
    bias: Optional[jnp.ndarray] = None,
    fuse_relu: bool = False,
    tm: int = 512,
    tn: int = 1024,
    tk: int = 2048,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """int4a8_matmul with the in-register unpack amortized across M-tiles:
    grid reordered to (N-tiles, M-tiles, K-tiles) and the unpacked int8
    halves cached in a K-spanning VMEM scratch per N-tile — the unpack runs
    once per weight element instead of once per (M-tile, weight-tile).
    Costs 2*(K/2)*tn int8 scratch (4 MB at K=4096, tn=1024)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    Kh, N = w_packed.shape
    assert Kh * 2 == K, (x.shape, w_packed.shape)
    assert x.dtype == jnp.int8, x.dtype
    tm, tn = min(tm, M), min(tn, N)
    tk = min(tk, K)
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    n_k = K // tk
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    scale2 = jnp.broadcast_to(scale.astype(jnp.float32), (N,)).reshape(1, N)
    bias2 = bias.astype(jnp.float32).reshape(1, N)
    x3 = x.reshape(M, Kh, 2)
    xe = x3[:, :, 0]
    xo = x3[:, :, 1]

    grid = (N // tn, M // tm, n_k)
    return pl.pallas_call(
        functools.partial(_int4a8_cached_kernel, n_k=n_k, tkh=tk // 2,
                          fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda j, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk // 2), lambda j, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda j, i, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda j, i, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.int32),
            pltpu.VMEM((Kh, tn), jnp.int8),
            pltpu.VMEM((Kh, tn), jnp.int8),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K + Kh * N + 4 * M * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, w_packed, scale2, bias2)


# ---------------------------------------------------------------------------
# W4A16 fused dequant matmul (weight-only int4, group-wise scales)
# ---------------------------------------------------------------------------

def int4_dequant_halves(w_packed: jnp.ndarray, scales: jnp.ndarray,
                        group: int = 128):
    """Unpack packed int4 weights to the two de-interleaved bf16 halves
    (low-nibble rows 2r, high-nibble rows 2r+1), group scales folded in.

    One XLA elementwise pass, bandwidth-bound. Physically interleaving back
    to [K, N] would be the pair-row sublane merge Mosaic/XLA relayouts
    handle badly — the split-contraction form never needs it."""
    Kh, N = w_packed.shape
    wp = w_packed.astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    sh = jnp.repeat(scales.astype(jnp.float32), group // 2, axis=0)  # [Kh, N]
    return ((lo * sh).astype(jnp.bfloat16), (hi * sh).astype(jnp.bfloat16))


@functools.partial(jax.jit, static_argnames=("group", "fuse_relu"))
def int4_matmul_xla2(
    x: jnp.ndarray,  # [M, K] fp32/bf16
    w_packed: jnp.ndarray,  # [K//2, N] uint8
    scales: jnp.ndarray,  # [K//group, N] fp32
    bias: Optional[jnp.ndarray] = None,
    group: int = 128,
    fuse_relu: bool = False,
) -> jnp.ndarray:
    """Two-pass W4A16 GEMM: XLA dequant of the packed weights into two bf16
    halves (transient, bandwidth-bound), then two full-rate bf16 MXU dots
    (split contraction over even/odd K rows, fp32 accumulation).

    Measured (v5e, 4096x4096 weight, tools/bench_vit_interior.py): the
    two-pass wins at SMALL M where the fused kernel's per-M-tile in-register
    unpack is unamortized (M=256: 122.5 vs 111 TFLOPS-effective), and loses
    at large M where the transient bf16 copy's extra HBM round-trip costs
    more than the unpack (M=4096: 115.4 vs 126.4; M=512: 127.2 vs 123.3 —
    still two-pass). int4_matmul_auto routes at the measured crossover
    (M=1024). Weights stay int4 in HBM (model residency); the bf16 copy
    lives only inside this call."""
    M, K = x.shape
    Kh, N = w_packed.shape
    assert Kh * 2 == K, (x.shape, w_packed.shape)
    wlo, whi = int4_dequant_halves(w_packed, scales, group)
    x3 = x.astype(jnp.bfloat16).reshape(M, Kh, 2)
    y = jax.lax.dot(x3[:, :, 0], wlo, preferred_element_type=jnp.float32)
    y = y + jax.lax.dot(x3[:, :, 1], whi, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias.astype(jnp.float32)
    if fuse_relu:
        y = jnp.maximum(y, 0.0)
    return y


def int4_matmul_auto(x, w_packed, scales, bias=None, group=128,
                     fuse_relu=False, m_threshold: int = 1024, **kw):
    """Route W4A16 GEMM by measurement: the per-shape autotune cache
    (ops/tile_autotune.autotune_w4a16) records which impl — two-pass XLA
    dequant, fused in-register unpack, or k-cached unpack — won at this
    (M, K, N) on this device. Unmeasured shapes fall back to the hand-tuned
    M crossover (two-pass below m_threshold: unpack-amortization-bound;
    fused at or above: HBM-traffic-bound — see int4_matmul_xla2)."""
    from dlq_tpu.ops.tile_autotune import lookup

    M, K = x.shape
    e = lookup("w4a16", M, K, w_packed.shape[1])
    impl = e.get("impl") if (e and e.get("ms") is not None
                             and e.get("group", group) == group) else None
    tiles = (e.get("tiles") or {}) if impl else {}
    if impl is None:
        impl = "xla2" if M < m_threshold else "fused"
    if impl == "xla2":
        return int4_matmul_xla2(x, w_packed, scales, bias, group=group,
                                fuse_relu=fuse_relu)
    if impl.startswith("cached"):
        if impl == "cached_tn512":  # legacy entry format (pre tile-aware)
            tiles = {"tn": 512, **tiles}
        return int4_matmul_cached(x, w_packed, scales, bias, group=group,
                                  fuse_relu=fuse_relu, **{**tiles, **kw})
    if "tm" in tiles:  # the padded wrapper takes its M granule as tile_m
        tiles = dict(tiles)
        tiles["tile_m"] = tiles.pop("tm")
    return int4_matmul_padded(x, w_packed, scales, bias, group=group,
                              fuse_relu=fuse_relu, **{**tiles, **kw})


def _int4_mm_kernel(xe_ref, xo_ref, wp_ref, scale_ref, bias_ref, o_ref, acc_ref,
                    *, n_k, tk, group, fuse_relu):
    k = pl.program_id(2)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    # Packed byte r holds logical K-rows 2r (low nibble) and 2r+1 (high).
    # Instead of physically interleaving (a [tk/2, 2, tn] intermediate whose
    # sublane dim of 2 Mosaic cannot tile), split the contraction:
    #   sum_k x[k] w[k] = x_even @ w_lo + x_odd @ w_hi
    # where x_even/x_odd are the de-interleaved activation columns (done once
    # outside the kernel). Widen to i32 for the shifts (no sub-word vector
    # shift on TPU), sign-extend, dequant in-register.
    wp = wp_ref[:].astype(jnp.int32)
    lo = wp & 0xF
    hi = (wp >> 4) & 0xF
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    # group-wise scales: rows r of lo/hi belong to group (2r)//group; with
    # group even this is r // (group//2) — element-repeat each group row
    # group//2 times over the [tk//2, tn] nibble matrices
    ng = tk // group
    s = scale_ref[pl.ds(k * ng, ng), :]
    tn_ = s.shape[-1]
    half = group // 2
    scales_h = jnp.broadcast_to(s[:, None, :], (ng, half, tn_)).reshape(tk // 2, tn_)
    sh = scales_h.astype(jnp.bfloat16)
    acc_ref[:] += jax.lax.dot(
        xe_ref[:].astype(jnp.bfloat16), lo.astype(jnp.bfloat16) * sh,
        preferred_element_type=jnp.float32,
    )
    acc_ref[:] += jax.lax.dot(
        xo_ref[:].astype(jnp.bfloat16), hi.astype(jnp.bfloat16) * sh,
        preferred_element_type=jnp.float32,
    )

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:] + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y


def _int4_cached_kernel(xe_ref, xo_ref, wp_ref, scale_ref, bias_ref, o_ref,
                        acc_ref, lo_scr, hi_scr, *, n_k, tk, tkh, group,
                        fuse_relu):
    # grid (j, i, k): dequantize (unpack + group scale) once per weight tile
    # at i == 0 into K-spanning bf16 scratches, reuse across M-tiles.
    i = pl.program_id(1)
    k = pl.program_id(2)

    @pl.when(i == 0)
    def _():
        wp = wp_ref[:].astype(jnp.int32)
        lo = wp & 0xF
        hi = (wp >> 4) & 0xF
        lo = jnp.where(lo >= 8, lo - 16, lo)
        hi = jnp.where(hi >= 8, hi - 16, hi)
        ng = tk // group
        s = scale_ref[pl.ds(k * ng, ng), :]
        tn_ = s.shape[-1]
        half = group // 2
        sh = jnp.broadcast_to(s[:, None, :], (ng, half, tn_)).reshape(
            tkh, tn_).astype(jnp.bfloat16)
        lo_scr[pl.ds(k * tkh, tkh), :] = lo.astype(jnp.bfloat16) * sh
        hi_scr[pl.ds(k * tkh, tkh), :] = hi.astype(jnp.bfloat16) * sh

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot(
        xe_ref[:].astype(jnp.bfloat16), lo_scr[pl.ds(k * tkh, tkh), :],
        preferred_element_type=jnp.float32)
    acc_ref[:] += jax.lax.dot(
        xo_ref[:].astype(jnp.bfloat16), hi_scr[pl.ds(k * tkh, tkh), :],
        preferred_element_type=jnp.float32)

    @pl.when(k == n_k - 1)
    def _():
        y = acc_ref[:] + bias_ref[:]
        if fuse_relu:
            y = jnp.maximum(y, 0.0)
        o_ref[:] = y


@functools.partial(
    jax.jit, static_argnames=("group", "fuse_relu", "tm", "tn", "tk", "interpret")
)
def int4_matmul_cached(
    x: jnp.ndarray,  # [M, K] fp32/bf16
    w_packed: jnp.ndarray,  # [K//2, N] uint8
    scales: jnp.ndarray,  # [K//group, N] fp32
    bias: Optional[jnp.ndarray] = None,
    group: int = 128,
    fuse_relu: bool = False,
    tm: int = 1024,
    tn: int = 512,
    tk: int = 1024,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """int4_matmul (W4A16 group-wise) with the dequant amortized across
    M-tiles via K-spanning bf16 weight scratches — the same k-cached scheme
    as int4a8_matmul_cached. Scratch cost 2*(K/2)*tn bf16 (4 MB at K=4096,
    tn=512)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    Kh, N = w_packed.shape
    assert Kh * 2 == K, (x.shape, w_packed.shape)
    tm, tn = min(tm, M), min(tn, N)
    tk = min(tk, K)
    if tk % group != 0:
        tk = group
    if tk < K and tk < 8 * group:
        tk = min(K, 8 * group)
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    assert K % group == 0 and scales.shape == (K // group, N), scales.shape
    assert group % 2 == 0, group
    n_k = K // tk
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias2 = bias.astype(jnp.float32).reshape(1, N)
    x3 = x.astype(jnp.bfloat16).reshape(M, Kh, 2)
    xe = x3[:, :, 0]
    xo = x3[:, :, 1]

    grid = (N // tn, M // tm, n_k)
    return pl.pallas_call(
        functools.partial(_int4_cached_kernel, n_k=n_k, tk=tk, tkh=tk // 2,
                          group=group, fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda j, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk // 2), lambda j, i, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda j, i, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, tn), lambda j, i, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda j, i, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda j, i, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tm, tn), jnp.float32),
            pltpu.VMEM((Kh, tn), jnp.bfloat16),
            pltpu.VMEM((Kh, tn), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + Kh * N + 4 * M * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, w_packed, scales, bias2)


@functools.partial(
    jax.jit, static_argnames=("group", "fuse_relu", "tm", "tn", "tk", "interpret")
)
def int4_matmul(
    x: jnp.ndarray,  # [M, K] fp32/bf16
    w_packed: jnp.ndarray,  # [K//2, N] uint8 (two nibbles per byte along K)
    scales: jnp.ndarray,  # [K//group, N] fp32
    bias: Optional[jnp.ndarray] = None,
    group: int = 128,
    fuse_relu: bool = False,
    tm: int = 512,
    tn: int = 512,
    tk: int = 4096,
    interpret: bool | None = None,
) -> jnp.ndarray:
    """Weight-only int4 GEMM: weights live packed in HBM (4 bits/value +
    fp32 scale per 128-group), unpacked + dequantized in-register.

    The in-register unpack (widen/shift/sign-extend/scale on the VPU) runs
    once per (M-tile, weight-tile). Round-5 sweep (runlogs/r5/tiles5.jsonl):
    large-tk tiles (512,512,4096) measure **143.5 TFLOPS at 4096^3** (73%
    of v5e bf16 peak; the old (1024,512,1024) default read 128.2 same-run).
    Non-dividing shapes degrade tiles gracefully by halving (tk stays a
    group multiple). Activations are cast to bf16 once outside the kernel
    (the MXU runs bf16 anyway; halves x VMEM/DMA)."""
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    M, K = x.shape
    Kh, N = w_packed.shape
    assert Kh * 2 == K, (x.shape, w_packed.shape)
    tm, tn = min(tm, M), min(tn, N)
    tk = min(tk, K)
    while M % tm:
        tm //= 2
    while N % tn:
        tn //= 2
    while K % tk and tk > group:
        tk //= 2
    if tk % group != 0:
        tk = group
    # the in-kernel scales slice reads tk/group sublanes; Mosaic needs >= 8
    # (or the full scales dim). Grow tk to 8 groups unless K is one tile.
    if tk < K and tk < 8 * group:
        tk = min(K, 8 * group)
    assert M % tm == 0 and N % tn == 0 and K % tk == 0, (M, N, K, tm, tn, tk)
    assert K % group == 0 and scales.shape == (K // group, N), scales.shape
    assert group % 2 == 0, group
    n_k = K // tk
    if bias is None:
        bias = jnp.zeros((N,), jnp.float32)
    bias2 = bias.astype(jnp.float32).reshape(1, N)
    # de-interleave activation columns once (matches the nibble packing):
    # x_even pairs with low nibbles (rows 2r), x_odd with high (rows 2r+1)
    x3 = x.astype(jnp.bfloat16).reshape(M, Kh, 2)
    xe = x3[:, :, 0]
    xo = x3[:, :, 1]

    grid = (M // tm, N // tn, n_k)
    return pl.pallas_call(
        functools.partial(_int4_mm_kernel, n_k=n_k, tk=tk, group=group, fuse_relu=fuse_relu),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, tk // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, tk // 2), lambda i, j, k: (i, k), memory_space=pltpu.VMEM),
            pl.BlockSpec((tk // 2, tn), lambda i, j, k: (k, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((K // group, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tn), lambda i, j, k: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j, k: (i, j), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.float32),
        scratch_shapes=[pltpu.VMEM((tm, tn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * M * N * K,
            bytes_accessed=M * K * 2 + Kh * N + 4 * M * N,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xe, xo, w_packed, scales, bias2)

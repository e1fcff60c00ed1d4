"""Quantized conv / dense ops at the XLA level.

Numerics spec (the contract every backend and kernel must match):
  * activations quantized symmetric int8 with a static per-site scale
    (``round`` half-away-from-zero is NOT used; we use round-half-even like
    jnp.round, and the simulated-quant oracle uses the same)
  * int8 x int8 -> int32 accumulation (MXU native on v5e; 2x bf16 TOPS)
  * rescale in fp32: y = acc * (act_scale * w_scale[oc]) + bias[oc]
  * optional fused relu epilogue

Where a backend cannot lower integer conv/dot, we fall back to fp32 compute
on the SAME integer values; any divergence from int32 accumulation is then a
property of the backend, caught by the parity tests' tolerances.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from dlq_tpu.quant.quantize import QTensor, quantize_act


def _int4_kernel_ok(qw) -> bool:
    from dlq_tpu.ops.pallas_matmul import int4_shapes_ok

    K, N = qw.shape
    return int4_shapes_ok(K, N, qw.group)


@functools.cache
def int8_conv_supported(platform: Optional[str] = None) -> bool:
    """Probe once: can this backend lower int8xint8->int32 conv?"""
    try:
        a = jnp.ones((1, 8, 8, 8), jnp.int8)
        k = jnp.ones((3, 3, 8, 8), jnp.int8)
        out = jax.jit(
            lambda a, k: jax.lax.conv_general_dilated(
                a, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
        )(a, k)
        out.block_until_ready()
        return out.dtype == jnp.int32
    except Exception:
        return False


@functools.cache
def int8_dot_supported(platform: Optional[str] = None) -> bool:
    try:
        a = jnp.ones((8, 8), jnp.int8)
        out = jax.jit(lambda a: jax.lax.dot(a, a, preferred_element_type=jnp.int32))(a)
        out.block_until_ready()
        return out.dtype == jnp.int32
    except Exception:
        return False


def resolve_depthwise(impl: Optional[str] = None) -> str:
    """Resolve the depthwise-conv implementation ONCE, at construction time.

    Call this when building an engine/ctx (Python time), not inside a traced
    forward: the jit cache would otherwise freeze the first-seen env value
    and two engines in one process could never differ (ADVICE r2).

      impl given ("int8"|"fp32"|"stencil") -> used as-is
      impl None -> DLQ_DEPTHWISE env default ("int8"), guarded by a one-time
                   exactness canary: the historical failure mode of the int8
                   grouped conv was SILENT wrong output on an older libtpu,
                   so before trusting it we compare a small fused
                   conv+requant chain against the int32 stencil oracle and
                   fall back to the stencil if it miscompiles.
    """
    import os

    if impl is None:
        impl = os.environ.get("DLQ_DEPTHWISE", "int8")
    if impl not in ("int8", "fp32", "stencil"):
        raise ValueError(f"DLQ_DEPTHWISE must be int8|fp32|stencil, got {impl!r}")
    if impl == "int8" and not depthwise_int8_exact(jax.default_backend()):
        import warnings

        warnings.warn(
            "int8 grouped conv + requant canary FAILED on this backend "
            "(the round-1 libtpu miscompile class) — depthwise falls back "
            "to the exact int32 stencil. Set DLQ_DEPTHWISE=fp32 only for "
            "A/B (inexact on TPU).", RuntimeWarning)
        return "stencil"
    return impl


_canary_cache: dict = {}


def depthwise_int8_exact(platform: Optional[str] = None) -> bool:
    """One-time canary: int8 grouped conv fused with a requant epilogue vs
    the int32 stencil oracle, on a shape from the historical miscompile
    class (tools/repro_int8_backend_bugs.py case A). True iff bit-exact.

    Can only probe at clean trace state (an inner jit invoked during an
    outer trace is INLINED and returns tracers) — a ctx constructed inside
    a user's jit trusts the impl unless an engine/clean-state caller
    already probed this backend (engines resolve at build time, so the
    production paths are always guarded)."""
    if platform in _canary_cache:
        return _canary_cache[platform]
    from jax._src.core import trace_state_clean  # no public alias yet

    if not trace_state_clean():
        return True
    try:
        import numpy as np

        rng = np.random.default_rng(7)
        x = jnp.asarray(rng.integers(-100, 101, (2, 16, 16, 96)), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 81, (3, 3, 1, 96)), jnp.int8)

        def chain(acc):
            y = acc.astype(jnp.float32) * 0.003 + 0.1
            return jnp.clip(jnp.round(y / 0.021), 0, 127).astype(jnp.int8)

        got = jax.jit(lambda a: chain(jax.lax.conv_general_dilated(
            a, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=96,
            preferred_element_type=jnp.int32)))(x)
        ref = jax.jit(lambda a: chain(_depthwise_int8_stencil(
            a, w, (1, 1), [(1, 1), (1, 1)])))(x)
        got.block_until_ready()
        ok = bool(jnp.array_equal(got, ref))
    except Exception:
        ok = False
    _canary_cache[platform] = ok
    return ok


def _depthwise_int8_fp32conv(xq: jnp.ndarray, wq: jnp.ndarray, stride, pads) -> jnp.ndarray:
    """Depthwise conv computed as an fp32 conv over the integer values.

    XLA's int8 feature_group_count conv on the TPU backend miscompiles
    non-deterministically when fused with quantize/rescale epilogues
    (observed: NaN/zero outputs whose appearance depends on unrelated graph
    consumers; bisected across several graph variants). The fp32 conv
    lowering is the mature path and is EXACT here: depthwise products sum at
    most kh*kw*127*127 < 2^24, inside fp32's integer-exact range. Measured
    37.7k img/s on MobileNetV2 b256 (vs 10.3k for an explicit int32 stencil
    and garbage from the int8 grouped conv).
    """
    return jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), stride, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=wq.shape[-1],
        preferred_element_type=jnp.float32,
    ).astype(jnp.int32)


def _depthwise_int8_stencil(xq: jnp.ndarray, wq: jnp.ndarray, stride, pads) -> jnp.ndarray:
    """Reference depthwise stencil (exact int32, conv-free) — kept as the
    slow-but-bulletproof fallback and as the oracle for the fp32 path."""
    kh, kw, _, C = wq.shape
    N, H, W, C2 = xq.shape
    assert C == C2, (wq.shape, xq.shape)
    xp = jnp.pad(xq, ((0, 0), pads[0], pads[1], (0, 0)))
    OH = (H + sum(pads[0]) - kh) // stride[0] + 1
    OW = (W + sum(pads[1]) - kw) // stride[1] + 1
    acc = jnp.zeros((N, OH, OW, C), jnp.int32)
    w32 = wq.astype(jnp.int32)
    for u in range(kh):
        for v in range(kw):
            # slice int8, widen inside the fused multiply (no int32 copy of x)
            sl = xp[:, u : u + (OH - 1) * stride[0] + 1 : stride[0],
                    v : v + (OW - 1) * stride[1] + 1 : stride[1], :]
            acc = acc + sl.astype(jnp.int32) * w32[u, v, 0]
    return acc


def _conv_int8(xq: jnp.ndarray, wq: jnp.ndarray, stride, padding, groups: int,
               depthwise: Optional[str] = None) -> jnp.ndarray:
    """int8 NHWC x HWIO conv -> int32 (or fp32-on-int-values fallback).

    depthwise: explicit impl for grouped convs ("int8"|"fp32"|"stencil"),
    normally threaded from the ctx/engine (resolve_depthwise at construction
    time); None resolves here as a convenience for direct callers.
    """
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    pads = [(padding[0], padding[0]), (padding[1], padding[1])]
    if groups > 1 and groups == wq.shape[-1] and wq.shape[2] == 1:
        impl = resolve_depthwise(depthwise)
        if impl == "fp32":
            # HISTORICAL path: exact on CPU, but on the TPU backend the fp32
            # conv lowers through bf16 MXU passes and is NOT exact for int8
            # products (bench_round2 phase C) — kept only for A/B repro
            return _depthwise_int8_fp32conv(xq, wq, stride, pads)
        if impl == "stencil":
            return _depthwise_int8_stencil(xq, wq, stride, pads)
        # int8 grouped conv with int32 accumulation: exact AND native rate.
        # The round-1 libtpu miscompiled this when fused with requant
        # epilogues (tools/repro_int8_backend_bugs.py); re-validated exact
        # on the current libtpu (tools/bench_round2.py phase C) and gated
        # model-level in tests + the bench_round2b depthwise A/B.
        return jax.lax.conv_general_dilated(
            xq, wq, stride, pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
    if int8_conv_supported(jax.default_backend()):
        return jax.lax.conv_general_dilated(
            xq, wq, stride, pads,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
            preferred_element_type=jnp.int32,
        )
    return jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), wq.astype(jnp.float32), stride, pads,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )


def pack_w_dual_xla(w: jnp.ndarray) -> jnp.ndarray:
    """Weights for the WIDTH-PAIR PACKED conv rewrite of a 3x3/s1/p1 conv
    with small channel counts (ResNet layer1: C=OC=64, where XLA's int8
    conv runs at 50% lane fill).

    The rewrite: pad x by 1, merge width pairs into channels (a FREE
    row-major reshape, [N,H+2,W+2,C] -> [N,H+2,(W+2)/2,2C]), run ONE
    3x2-window VALID conv with 2C input and 2C output channels (full
    128-lane fill), and reshape the output pairs back. Output channel
    block j in {0,1} holds output pixel w=2*w2+j; input channel block k
    holds pixel 2m+k. Tap algebra: original tap v contributes to (t, k, j)
    with v = 2t + k - j; out-of-range taps are ZERO weights, so the sums
    are bit-identical to the original conv at a 4/3 MAC overhead —
    theoretical net ~1.5x over the 50%-util direct conv.

    w: [3, 3, C, OC] -> [3, 2, 2C, 2OC].
    """
    kh, kw, C, OC = w.shape
    assert (kh, kw) == (3, 3), w.shape
    blocks = []
    for t in range(2):
        rows = []
        for k in range(2):
            cols = []
            for j in range(2):
                v = 2 * t + k - j
                cols.append(w[:, v] if 0 <= v < 3 else jnp.zeros_like(w[:, 0]))
            rows.append(jnp.concatenate(cols, axis=-1))    # [3, C, 2OC]
        blocks.append(jnp.concatenate(rows, axis=-2))      # [3, 2C, 2OC]
    return jnp.stack(blocks, axis=1)                       # [3, 2, 2C, 2OC]


def conv_int8_dpx(xq: jnp.ndarray, w2: jnp.ndarray) -> jnp.ndarray:
    """Width-pair packed int8 conv (see pack_w_dual_xla): exact rewrite of
    conv3x3/s1/p1 for even-width inputs. xq [N,H,W,C] int8, w2 the packed
    [3,2,2C,2OC] weights; returns int32 [N,H,W,OC]."""
    N, H, W, C = xq.shape
    assert W % 2 == 0, xq.shape
    OC2 = w2.shape[-1]
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    x2 = xp.reshape(N, H + 2, (W + 2) // 2, 2 * C)
    acc = jax.lax.conv_general_dilated(
        x2, w2, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )  # [N, H, W//2 ... wait: (W+2)/2 - 2 + 1 = W/2] -> [N,H,W/2,2OC]
    return acc.reshape(N, H, W, OC2 // 2)


def pack_w_s2d(w: jnp.ndarray) -> jnp.ndarray:
    """Weights for the SPACE-TO-DEPTH rewrite of a 3x3/s2/p1 conv
    (stage_roofline r3: XLA runs the 56-square stride-2 conv at 24% of int8
    peak). Pad x by 1, s2d(2) it (one transpose + reshapes), and run a
    2x2-window VALID conv with 4C input channels: tap (u,v) lands at
    (t_h, t_w, block kh*2+kw) with u = 2*t_h + kh, v = 2*t_w + kw; the
    (th,kh)=(1,1) row is ZERO (u=3 out of range) — 16C/9C = 1.78x MAC
    overhead, bit-exact. w: [3,3,C,OC] -> [2,2,4C,OC]."""
    kh_, kw_, C, OC = w.shape
    assert (kh_, kw_) == (3, 3), w.shape
    rows = []
    for th in range(2):
        cols = []
        for tw in range(2):
            blocks = []
            for kh in range(2):
                for kw in range(2):
                    u, v = 2 * th + kh, 2 * tw + kw
                    blocks.append(w[u, v] if (u < 3 and v < 3)
                                  else jnp.zeros_like(w[0, 0]))
            cols.append(jnp.concatenate(blocks, axis=0))   # [4C, OC]
        rows.append(jnp.stack(cols, axis=0))               # [2, 4C, OC]
    return jnp.stack(rows, axis=0)                         # [2, 2, 4C, OC]


def conv_int8_s2d(xq: jnp.ndarray, w4: jnp.ndarray) -> jnp.ndarray:
    """Space-to-depth int8 conv (see pack_w_s2d): exact rewrite of
    conv3x3/s2/p1 for even H/W. xq [N,H,W,C] int8 -> int32 [N,H/2,W/2,OC]."""
    N, H, W, C = xq.shape
    assert H % 2 == 0 and W % 2 == 0, xq.shape
    xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    h2, w2 = (H + 2) // 2, (W + 2) // 2
    x4 = xp.reshape(N, h2, 2, w2, 2, C).transpose(0, 1, 3, 2, 4, 5)
    x4 = x4.reshape(N, h2, w2, 4 * C)
    return jax.lax.conv_general_dilated(
        x4, w4, (1, 1), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )


def conv_int8_mm1x1(xq: jnp.ndarray, w2d: jnp.ndarray) -> jnp.ndarray:
    """1x1/s1 conv as an int8 matmul on the [N*H*W, C] view — a FREE
    relayout in NHWC (the reshape is a bitcast), unlike every round-3
    rewrite that paid a relayout to feed a better-shaped conv. Targets the
    bottleneck-ResNet body (1x1 convs are ~2/3 of ResNet-50+ FLOPs), a
    shape class the round-3 campaign never measured (it covered 1x1/s2
    downsamples only, BENCH_NOTES 'exhaustive exact-rewrite campaign').
    Exact. xq [N,H,W,C], w2d [C,OC] -> int32 [N,H,W,OC]."""
    N, H, W, C = xq.shape
    acc = jax.lax.dot(xq.reshape(N * H * W, C), w2d,
                      preferred_element_type=jnp.int32)
    return acc.reshape(N, H, W, w2d.shape[-1])


def conv_int8_down_mm(xq: jnp.ndarray, w2d: jnp.ndarray) -> jnp.ndarray:
    """1x1/s2 downsample as strided slice + int8 matmul (the direct conv
    lowering measures 7-27% of peak at the ResNet shapes). Exact.
    xq [N,H,W,C], w2d [C,OC] -> int32 [N,H/2,W/2,OC]."""
    N, H, W, C = xq.shape
    OH, OW = (H + 1) // 2, (W + 1) // 2
    xs = xq[:, ::2, ::2, :].reshape(N * OH * OW, C)
    acc = jax.lax.dot(xs, w2d, preferred_element_type=jnp.int32)
    return acc.reshape(N, OH, OW, w2d.shape[-1])


def qconv2d(
    x: jnp.ndarray,
    qw: QTensor,
    bias: Optional[jnp.ndarray],
    act_scale: jnp.ndarray,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    groups: int = 1,
    fuse_relu: bool = False,
    act_qmax: int = 127,
    depthwise: Optional[str] = None,
    rewrites: tuple = (),
) -> jnp.ndarray:
    """W8A8 conv: quantize input with the calibrated static scale, int8 conv
    with int32 accum, fp32 per-channel rescale (+bias, +relu). The quantize
    and rescale are elementwise and fuse into the conv under jit.

    rewrites: exact re-expressions of the same integer sums; "mm1x1" runs
    1x1/s1/p0 convs as an int8 dot on the [N*H*W, C] view (free NHWC
    relayout — +6% model-level on bottleneck resnets through the fused
    interchange, runlogs/r6/mm1x1.jsonl; applies to unpacked-int4 weights
    too since the unpack lands in int8).

    qw.values: HWIO int8 (or nibble-packed int4 on the [K, O] view with
    per-OC scales — W4A8: the exact in-graph unpack to int8 feeds the same
    int8 conv, so int4 conv weights cost half the HBM residency/stream of
    W8A8 at the full int8 conv rate; the unpack is one elementwise pass over
    the small weight tensor). qw.scale: per-tensor () or per-OC (O,).
    """
    if qw.group is not None:
        raise ValueError(
            "group-wise quantized conv cannot fold scales post-accumulation; "
            "use weight-only dequant (DeployCtx weight_only path)")
    from dlq_tpu.quant.quantize import unpack_to_layout

    wq = unpack_to_layout(qw)  # int8/int2 as-is, int4 unpacked in-graph
    xq = quantize_act(x, act_scale, act_qmax)
    st = (stride, stride) if isinstance(stride, int) else tuple(stride)
    pd = (padding, padding) if isinstance(padding, int) else tuple(padding)
    if ("mm1x1" in rewrites and groups == 1 and wq.ndim == 4
            and wq.shape[:2] == (1, 1) and st == (1, 1) and pd == (0, 0)
            and int8_dot_supported(jax.default_backend())):
        acc = conv_int8_mm1x1(xq, wq.reshape(wq.shape[2], wq.shape[3]))
    else:
        acc = _conv_int8(xq, wq, stride, padding, groups, depthwise=depthwise)
    scale = act_scale * qw.scale  # () or (O,) — broadcasts over NHWC
    y = acc.astype(jnp.float32) * scale
    if bias is not None:
        y = y + bias
    if fuse_relu:
        y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)


def qdense(
    x: jnp.ndarray,
    qw: QTensor,
    bias: Optional[jnp.ndarray],
    act_scale: Optional[jnp.ndarray] = None,
    fuse_relu: bool = False,
    act_qmax: int = 127,
) -> jnp.ndarray:
    """Quantized dense.

    int8 weights + act_scale        -> W8A8 int matmul, int32 accum.
    int8/int4 weights, no act_scale -> weight-only: dequantized (in-register
    for the Pallas path, here via XLA fusion) matmul in fp32/bf16.
    qw.values: [I, O] int8 or packed int4.
    """
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]) if x.ndim != 2 else x
    if act_scale is not None and qw.bits == 4 and qw.group is not None:
        # group-wise W4 + quantized acts: group scales cannot fold into an
        # int epilogue, so quantize the activations (same decisions as the
        # simulate oracle) and run the dequantized-weight matmul on them.
        x2 = (quantize_act(x2, act_scale, act_qmax).astype(jnp.float32)
              * act_scale).astype(x.dtype)
        act_scale = None
    if act_scale is not None and qw.bits == 4 and qw.group is None:
        # W4A8: int4 per-OC weights on the int8 MXU rate. Pallas kernel when
        # shapes tile on TPU; otherwise unpack to int8 and fall through to
        # the int8 dot (same numerics: the unpack is exact).
        from dlq_tpu.quant.quantize import unpack_int4

        K, N = qw.shape
        xq = quantize_act(x2, act_scale, act_qmax)
        scale = jnp.broadcast_to(
            jnp.asarray(act_scale * qw.scale, jnp.float32), (N,))
        if (jax.default_backend() == "tpu" and K % 2 == 0
                and K % min(2048, K) == 0 and N % min(1024, N) == 0
                and N % 128 == 0):
            from dlq_tpu.ops.pallas_matmul import int4a8_matmul

            M = x2.shape[0]
            Mp = -(-M // 256) * 256
            xp = jnp.pad(xq, ((0, Mp - M), (0, 0))) if Mp != M else xq
            y = int4a8_matmul(xp, qw.values, scale, None, tm=256)
            y = y[:M] if Mp != M else y
        else:
            w8 = unpack_int4(qw.values, qw.shape)
            if int8_dot_supported(jax.default_backend()):
                acc = jax.lax.dot(xq, w8, preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32)
            else:
                y = jax.lax.dot(
                    xq.astype(jnp.float32), w8.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
            y = y * scale
    elif act_scale is not None and qw.bits in (2, 8):
        if qw.group is not None:
            raise ValueError(
                "group-wise scales cannot fold into the int matmul epilogue; "
                "use a per-channel scheme or the weight-only path")
        xq = quantize_act(x2, act_scale, act_qmax)
        if int8_dot_supported(jax.default_backend()):
            acc = jax.lax.dot(xq, qw.values, preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32)
        else:
            y = jax.lax.dot(
                xq.astype(jnp.float32), qw.values.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
        y = y * (act_scale * qw.scale)
    elif (
        qw.bits == 4
        and qw.group is not None
        and jax.default_backend() == "tpu"
        and _int4_kernel_ok(qw)
    ):
        # weight-only int4 on TPU: fused Pallas dequant matmul — weights stay
        # nibble-packed in HBM, unpacked in-register (never an fp32 copy)
        from dlq_tpu.ops.pallas_matmul import int4_matmul_padded

        y = int4_matmul_padded(
            x2.astype(jnp.bfloat16), qw.values, qw.scale, None, group=qw.group
        )
    else:
        # weight-only: XLA fuses the dequant into the matmul's operand read
        from dlq_tpu.quant.quantize import dequantize

        w = dequantize(qw).astype(x.dtype)
        y = jnp.dot(x2, w, preferred_element_type=jnp.float32)
    if bias is not None:
        y = y + bias
    if fuse_relu:
        y = jnp.maximum(y, 0.0)
    y = y.astype(x.dtype)
    return y.reshape(lead + (y.shape[-1],)) if x.ndim != 2 else y

"""GPTQ: Hessian-aware error-compensated weight rounding (PTQ upgrade).

Round-to-nearest treats every weight independently; GPTQ (Frantar et al.,
arXiv:2210.17323 — see PAPERS.md) quantizes the contraction dimension
sequentially and redistributes each row's rounding error onto the not-yet-
quantized rows through the inverse input-covariance (Hessian) — minimizing
the LAYER OUTPUT error ||X(W - What)||^2 instead of the weight error. At
int4/int2 this recovers most of the rounding damage for free at deploy time
(same QTensor format, same kernels, same scales — only the integer grid
assignment changes).

Pipeline fit: `collect_hessians` drives the SAME qforward topology with a
recording ctx (H += X^T X per site, conv inputs via im2col patches), and
`gptq_quantize_weights` is a drop-in replacement for `quantize_weights`.
The math runs in float64 numpy (one site at a time, blocked updates — this
is offline calibration tooling, not the deploy path).

Scope: per-tensor / per-OC / group-wise schemes; grouped convs (depthwise)
fall back to round-to-nearest (per-group Hessians aren't worth the code).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.models.common import conv2d, dense, relu
from dlq_tpu.quant.qconfig import QConfig, QScheme
from dlq_tpu.quant.quantize import (
    QTensor, effective_weight_scheme, pack_int4, quantize_tensor,
)

FlatParams = Dict[str, Dict[str, Any]]


class HessianCollector:
    """qforward ctx that runs fp32 and accumulates each quantized site's
    input Hessian H = sum X^T X (float64, IHW-ordered K for convs — the
    ordering `lax.conv_general_dilated_patches` produces)."""

    def __init__(self, flat: FlatParams):
        self.flat = flat
        self.H: Dict[str, np.ndarray] = {}
        self.xsum: Dict[str, np.ndarray] = {}  # sum of inputs (for E[x])
        self.col_amax: Dict[str, np.ndarray] = {}  # per-column |x| max
        self.n: Dict[str, int] = {}
        self.meta: Dict[str, Dict[str, Any]] = {}

    def has(self, name):
        return name in self.flat

    def _accum(self, name, X2: jnp.ndarray):
        h = np.asarray(jnp.matmul(X2.T, X2, preferred_element_type=jnp.float32),
                       np.float64)
        self.H[name] = self.H.get(name, 0.0) + h
        self.xsum[name] = self.xsum.get(name, 0.0) + np.asarray(
            jnp.sum(X2, axis=0), np.float64)
        self.n[name] = self.n.get(name, 0) + X2.shape[0]
        ca = np.asarray(jnp.max(jnp.abs(X2), axis=0), np.float64)
        prev = self.col_amax.get(name)
        self.col_amax[name] = ca if prev is None else np.maximum(prev, ca)

    def mean(self, name) -> Optional[np.ndarray]:
        return (self.xsum[name] / self.n[name]) if name in self.xsum else None

    def channel_amax(self, name) -> Optional[np.ndarray]:
        """Per-input-channel abs-max reconstructed from the column amax
        (conv columns are channel-major IHW: reshape [C, kh*kw] and reduce).
        Lets smooth/auto-alpha reuse this collection instead of a second
        forward pass over the calibration set."""
        a = self.col_amax.get(name)
        if a is None:
            return None
        m = self.meta.get(name, {})
        if m.get("kind") == "conv":
            return a.reshape(m["cin"], -1).max(1)
        return a

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.flat[name]
        w = p["w"]
        if groups == 1:
            st = (stride, stride) if isinstance(stride, int) else stride
            pd = (padding, padding) if isinstance(padding, int) else padding
            patches = jax.lax.conv_general_dilated_patches(
                x, (w.shape[0], w.shape[1]), st,
                [(pd[0], pd[0]), (pd[1], pd[1])],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            self._accum(name, patches.reshape(-1, patches.shape[-1]))
            self.meta[name] = {"kind": "conv", "cin": x.shape[-1]}
        else:
            self.meta[name] = {"kind": "grouped"}  # RTN fallback
        y = conv2d(x, w, stride=stride, padding=padding, groups=groups,
                   bias=p.get("b"))
        return relu(y) if fuse_relu else y

    def dense(self, name, x, *, fuse_relu=False):
        p = self.flat[name]
        self._accum(name, x.reshape(-1, x.shape[-1]))
        self.meta[name] = {"kind": "dense"}
        y = dense(x, p["w"], p.get("b"))
        return relu(y) if fuse_relu else y


def collect_hessians(qforward, flat: FlatParams, cfg, batches) -> HessianCollector:
    col = HessianCollector(flat)
    for x in batches:
        qforward(col, jnp.asarray(x), cfg)
    return col


def _scales_from(base: QTensor, w_shape) -> np.ndarray:
    """Per-element scale matrix in the weight's layout, broadcast from the
    RTN baseline QTensor's STORED scales — the grid GPTQ rounds on must be
    exactly the grid the stored scale dequantizes with (no independent
    re-derivation that could drift from quantize_tensor)."""
    s = np.asarray(base.scale, np.float64)
    K = int(np.prod(w_shape[:-1]))
    O = w_shape[-1]
    if base.group is not None:
        S2 = np.repeat(s, base.group, axis=0)  # [K//g, O] -> [K, O]
    elif base.axis is not None:
        S2 = np.broadcast_to(s.reshape(1, O), (K, O))
    else:
        S2 = np.full((K, O), float(s))
    return S2.reshape(w_shape)


def gptq_rows(W: np.ndarray, H: np.ndarray, S: np.ndarray, qmin: int,
              qmax: int, damp: float = 0.01, block: int = 128,
              actorder: bool = True) -> np.ndarray:
    """Core GPTQ recursion on a [K, O] weight with per-element scales S:
    returns the INTEGER grid assignment Q [K, O] (int8 range). Blocked:
    rank-1 error propagation inside each block, one GEMM to the remainder.
    Verified equal to the textbook OBQ recursion; with a diagonal H it
    reduces exactly to round-to-nearest."""
    import scipy.linalg as sla

    K, O = W.shape
    W = W.astype(np.float64).copy()
    H = H.astype(np.float64).copy()
    dead = np.diag(H) == 0
    if dead.any():
        H[dead, dead] = 1.0
        W[dead] = 0.0
    perm = np.argsort(-np.diag(H)) if actorder else np.arange(K)
    inv = np.argsort(perm)
    W = W[perm]
    S = S[perm]
    H = H[np.ix_(perm, perm)]
    H[np.diag_indices(K)] += damp * float(np.mean(np.diag(H)))
    U = sla.cholesky(np.linalg.inv(H), lower=False)  # Hinv = U^T U, U upper

    Q = np.zeros((K, O), np.float64)
    for b0 in range(0, K, block):
        b1 = min(b0 + block, K)
        Err = np.zeros((b1 - b0, O))
        for i in range(b0, b1):
            q = np.clip(np.round(W[i] / S[i]), qmin, qmax)
            Q[i] = q
            err = (W[i] - q * S[i]) / U[i, i]
            if i + 1 < b1:
                W[i + 1 : b1] -= np.outer(U[i, i + 1 : b1], err)
            Err[i - b0] = err
        if b1 < K:
            W[b1:] -= U[b0:b1, b1:].T @ Err
    return Q[inv].astype(np.int8)


def gptq_quantize_weights(
    flat: FlatParams,
    qcfg: QConfig,
    collector: HessianCollector,
    damp: float = 0.01,
    block: int = 128,
    actorder: bool = True,
) -> FlatParams:
    """Drop-in replacement for `quantize_weights`: same QTensor output
    (same scales, same packing, same deploy paths) with GPTQ grid
    assignment wherever a Hessian was collected; RTN elsewhere."""
    from dlq_tpu.quant.model_quant import quantize_weights

    rtn = quantize_weights(flat, qcfg)  # scales/packing/fallbacks baseline
    out: FlatParams = {}
    for site, p in flat.items():
        w = np.asarray(p["w"], np.float32)
        scheme = effective_weight_scheme(w.shape, qcfg.scheme_for(site))
        H = collector.H.get(site)
        kind = collector.meta.get(site, {}).get("kind")
        if H is None or kind == "grouped":
            out[site] = rtn[site]
            continue
        base: QTensor = rtn[site]["qw"]
        S = _scales_from(base, w.shape)
        if w.ndim == 4:  # conv HWIO: H is IHW-ordered (patches layout)
            Wg = w.transpose(2, 0, 1, 3).reshape(-1, w.shape[-1])
            Sg = S.transpose(2, 0, 1, 3).reshape(Wg.shape)
            Q = gptq_rows(Wg, H, Sg, scheme.qmin, scheme.qmax, damp, block,
                          actorder)
            kh, kw, ci, co = w.shape
            q_hwio = Q.reshape(ci, kh, kw, co).transpose(1, 2, 0, 3)
            q2 = q_hwio.reshape(-1, co)  # the HWI-flattened storage view
        else:
            Q = gptq_rows(w, H, S, scheme.qmin, scheme.qmax, damp, block,
                          actorder)
            q2 = Q
        if scheme.bits == 4:
            values = pack_int4(jnp.asarray(q2, jnp.int8))
        else:
            # match the baseline's storage layout (HWIO for per-OC conv,
            # [K, O] for dense/group-wise)
            values = jnp.asarray(q2.reshape(base.values.shape), jnp.int8)
        qw = QTensor(values=values, scale=base.scale, zero_point=None,
                     bits=scheme.bits, axis=base.axis, group=base.group,
                     shape=base.shape, orig_shape=base.orig_shape)
        out[site] = {"qw": qw, "b": p.get("b")}
    return out

def bias_correct(flat: FlatParams, qflat: FlatParams,
                 collector: HessianCollector) -> FlatParams:
    """Analytic first-order bias correction (Nagel et al., DFQ): weight
    quantization shifts each output channel's mean by E[(W - What)^T x];
    absorb it into the bias using the collector's input means — no extra
    forward passes, exact to first order, composes with RTN/GPTQ/any scheme.
    Sites without collected stats (grouped convs) pass through unchanged."""
    from dlq_tpu.quant.quantize import dequantize

    out: FlatParams = {}
    for site, p in qflat.items():
        mu = collector.mean(site)
        kind = collector.meta.get(site, {}).get("kind")
        if mu is None or kind == "grouped":
            out[site] = p
            continue
        w = np.asarray(flat[site]["w"], np.float64)
        qw = p["qw"]
        wq = np.asarray(dequantize(qw), np.float64).reshape(qw.layout_shape)
        if w.ndim == 4:  # collector mean is IHW-ordered (patches layout)
            dw2 = (w - wq).transpose(2, 0, 1, 3).reshape(-1, w.shape[-1])
        else:
            dw2 = w - wq
        delta = mu @ dw2  # E[(W - What)^T x] per output channel
        b = p.get("b")
        b_new = jnp.asarray((0.0 if b is None else np.asarray(b, np.float64))
                            + delta, jnp.float32)
        out[site] = {**p, "b": b_new}
    return out

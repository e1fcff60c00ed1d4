"""SmoothQuant: per-input-channel activation-outlier migration (W8A8 aid).

Per-tensor activation scales are hostage to the worst channel: one outlier
channel forces a huge scale and crushes everyone else's resolution.
SmoothQuant (Xiao et al., arXiv:2211.10438 — see PAPERS.md) rebalances each
quantized matmul site with per-input-channel factors

    s_j = amax_act_j^alpha / amax_w_j^(1-alpha)

computing y = (x / s) (s * W): weights absorb the outliers offline (exact),
activations flatten so a per-tensor int8 scale fits. The runtime cost is one
per-channel multiply before quantize_act, which XLA fuses into the
quantize; the weight scaling folds into the stored integer weights.

Pipeline: `collect_channel_amax` -> `compute_smooth` -> `apply_smooth`
(offline, exact) -> calibrate/quantize the smoothed model with
`SmoothObserveCtx`-collected scales -> deploy with `SmoothDeployCtx`.
fp32-interchange contexts only (the int8-wire fused ctxs pre-commit a
scalar wire scale that per-channel smoothing would break).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np

from dlq_tpu.quant.model_quant import DeployCtx, FlatParams, ObserveCtx, SimulateCtx


class ChannelAmaxCollector:
    """fp32 forward recording per-input-channel abs-max at every site
    (channels = last input axis for both NHWC conv and [.., K] dense)."""

    def __init__(self, flat: FlatParams):
        self._obs = ObserveCtx(flat)
        self.amax: Dict[str, np.ndarray] = {}

    def has(self, name):
        return self._obs.has(name)

    def _record(self, name, x):
        a = np.asarray(jnp.max(jnp.abs(x), axis=tuple(range(x.ndim - 1))))
        prev = self.amax.get(name)
        self.amax[name] = a if prev is None else np.maximum(prev, a)

    def conv(self, name, x, **kw):
        self._record(name, x)
        return self._obs.conv(name, x, **kw)

    def dense(self, name, x, **kw):
        self._record(name, x)
        return self._obs.dense(name, x, **kw)


def collect_channel_amax(qforward, flat: FlatParams, cfg, batches) -> Dict[str, np.ndarray]:
    col = ChannelAmaxCollector(flat)
    for x in batches:
        qforward(col, jnp.asarray(x), cfg)
    return col.amax


def compute_smooth(flat: FlatParams, act_amax: Dict[str, np.ndarray],
                   alpha: float = 0.5) -> Dict[str, np.ndarray]:
    """Per-site smoothing vectors s [C_in]. Sites without recorded stats
    (or grouped convs, where per-channel migration crosses group boundaries)
    are skipped."""
    out: Dict[str, np.ndarray] = {}
    for site, a in act_amax.items():
        w = np.asarray(flat[site]["w"], np.float32)
        cin = w.shape[-2]
        if a.shape[-1] != cin:
            continue  # grouped conv (dw weights have I=1) — skip
        # per-input-channel weight amax: reduce every axis except I
        red = tuple(i for i in range(w.ndim) if i != w.ndim - 2)
        wmax = np.abs(w).max(axis=red)
        a = np.maximum(a.astype(np.float64), 1e-5)
        wmax = np.maximum(wmax.astype(np.float64), 1e-5)
        s = (a ** alpha) / (wmax ** (1.0 - alpha))
        out[site] = np.clip(s, 1e-5, 1e5).astype(np.float32)
    return out


def apply_smooth(flat: FlatParams, smooth: Dict[str, np.ndarray]) -> FlatParams:
    """Exact offline rebalance: W'[.., j, :] = s_j * W[.., j, :]. The
    matching x/s happens at runtime in the Smooth* contexts."""
    out: FlatParams = {}
    for site, p in flat.items():
        s = smooth.get(site)
        if s is None:
            out[site] = p
            continue
        w = jnp.asarray(p["w"])
        shape = [1] * w.ndim
        shape[-2] = -1
        out[site] = {**p, "w": w * jnp.asarray(s).reshape(shape)}
    return out


def _div(x, s: Optional[jnp.ndarray]):
    if s is None:
        return x
    shape = [1] * x.ndim
    shape[-1] = -1
    return x * (1.0 / jnp.asarray(s)).reshape(shape)


class _SmoothMixin:
    """Applies x/s before the underlying ctx's quantize-and-compute."""

    def _set_smooth(self, smooth: Dict[str, Any]):
        self.smooth = {k: jnp.asarray(v) for k, v in (smooth or {}).items()}

    def conv(self, name, x, **kw):
        return super().conv(name, _div(x, self.smooth.get(name)), **kw)

    def dense(self, name, x, **kw):
        return super().dense(name, _div(x, self.smooth.get(name)), **kw)


class SmoothObserveCtx(_SmoothMixin, ObserveCtx):
    """Observe pass over the SMOOTHED model (x/s inputs) — what calibrate
    must see so the act scales match deployment."""

    def __init__(self, flat, smooth):
        super().__init__(flat)
        self._set_smooth(smooth)


class SmoothDeployCtx(_SmoothMixin, DeployCtx):
    def __init__(self, qflat, act_scales, qcfg, smooth):
        super().__init__(qflat, act_scales, qcfg)
        self._set_smooth(smooth)


class SmoothSimulateCtx(_SmoothMixin, SimulateCtx):
    def __init__(self, qflat, act_scales, qcfg, smooth):
        super().__init__(qflat, act_scales, qcfg)
        self._set_smooth(smooth)


def smooth_calibrate(qforward, flat_smoothed: FlatParams, cfg, batches,
                     qcfg, smooth: Dict[str, np.ndarray]):
    """calibrate() over the smoothed model: per-site per-tensor act scales
    measured on the x/s inputs."""
    from dlq_tpu.quant.calibrate import calibrate

    def sites_fn(fp, x):
        ctx = SmoothObserveCtx(fp, smooth)
        qforward(ctx, x, cfg)
        return ctx.sites

    return calibrate(sites_fn, flat_smoothed, batches, qcfg)


def compute_smooth_auto(
    flat: FlatParams,
    act_amax: Dict[str, np.ndarray],
    collector,  # gptq.HessianCollector over the same calibration set
    qcfg,
    alphas=(0.0, 0.25, 0.4, 0.5, 0.6, 0.75),
) -> Dict[str, np.ndarray]:
    """AWQ-style per-site alpha search, scored ANALYTICALLY: the expected
    layer output error of a smoothed-then-quantized site is

        || X (W - diag(1/s) deq(quant(s W))) ||^2 = tr(dW^T H dW)

    with the calibration Hessian H = sum X^T X the GPTQ collector already
    holds — no forward passes per candidate. alpha=0.0 (no migration) is in
    the grid, so auto-smoothing never does worse than its own score of
    plain quantization. Conv H is IHW-ordered; dW is built in that order."""
    from dlq_tpu.quant.quantize import effective_weight_scheme

    out: Dict[str, np.ndarray] = {}
    for site, a in act_amax.items():
        w = np.asarray(flat[site]["w"], np.float64)
        cin = w.shape[-2]
        H = collector.H.get(site)
        if a.shape[-1] != cin or H is None:
            continue
        scheme = effective_weight_scheme(w.shape, qcfg.scheme_for(site))
        red = tuple(i for i in range(w.ndim) if i != w.ndim - 2)
        wmax = np.maximum(np.abs(w).max(axis=red), 1e-5)
        aa = np.maximum(a.astype(np.float64), 1e-5)

        def dw_for(s_vec):
            shape = [1] * w.ndim
            shape[-2] = -1
            ws = w * s_vec.reshape(shape)
            from dlq_tpu.quant.quantize import dequantize, quantize_tensor

            K = int(np.prod(w.shape[:-1]))
            qt = quantize_tensor(jnp.asarray(ws.reshape(K, w.shape[-1]),
                                             jnp.float32), scheme)
            deq = np.asarray(dequantize(qt), np.float64).reshape(w.shape)
            dW = w - deq / s_vec.reshape(shape)
            if w.ndim == 4:  # H is IHW-ordered
                return dW.transpose(2, 0, 1, 3).reshape(K, -1)
            return dW

        best_s, best_e = None, np.inf
        for alpha in alphas:
            s = (np.clip((aa ** alpha) / (wmax ** (1.0 - alpha)), 1e-5, 1e5)
                 if alpha > 0 else np.ones(cin))
            dW = dw_for(s)
            err = float(np.einsum("ko,kj,jo->", dW, H, dW))
            if err < best_e:
                best_e, best_s = err, s
        if best_s is not None and not np.allclose(best_s, 1.0):
            out[site] = best_s.astype(np.float32)
    return out


from dlq_tpu.quant.qat import QATCtx as _QATCtx  # noqa: E402


class SmoothQATCtx(_SmoothMixin, _QATCtx):
    """QAT fine-tuning of a smoothed model: the same x/s runtime divide the
    Smooth deploy ctx applies, so training and deployment see identical
    inputs. Train on `apply_smooth`ed params; deploy via SmoothDeployCtx."""

    def __init__(self, flat, act_scales, qcfg, smooth):
        super().__init__(flat, act_scales, qcfg)
        self._set_smooth(smooth)

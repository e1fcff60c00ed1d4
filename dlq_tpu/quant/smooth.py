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


def fold_smooth_into_ln_extras(extras: Dict[str, Any],
                               smooth: Dict[str, np.ndarray]
                               ) -> Dict[str, Any]:
    """Fold LN-foldable smoothing vectors into the ViT extras' LayerNorm
    affines: ln1 <- (g/s_qkv, b/s_qkv), ln2 <- (g/s_fc1, b/s_fc1).

    Because (g/s)·t + b/s == ((g·t + b))/s exactly, a store written with
    FOLDED extras + smoothed weights deploys the smoothed model through
    EVERY path — sitewise DeployCtx and the fused block kernels alike —
    with no SmoothDeployCtx and no smooth field in the artifact. This is
    what makes `ptq_auto(smooth_site_filter=VIT_LN_FOLDABLE)` results
    round-trippable through quant/store (vectors for non-foldable sites
    are refused: those genuinely need the runtime divide)."""
    bad = [k for k in smooth
           if not (k.endswith(".qkv") or k.endswith(".fc1"))]
    if bad:
        raise ValueError(
            f"only *.qkv / *.fc1 smoothing folds into LN affines; got "
            f"vectors for {bad} — restrict the recipe with "
            "smooth_site_filter=VIT_LN_FOLDABLE or deploy sitewise with "
            "SmoothDeployCtx")
    out = dict(extras)
    lns = []
    for i, ln in enumerate(extras["ln"]):
        new = {"ln1": ln["ln1"], "ln2": ln["ln2"]}
        for key, site in (("ln1", f"l{i}.qkv"), ("ln2", f"l{i}.fc1")):
            s = smooth.get(site)
            if s is not None:
                inv = 1.0 / jnp.asarray(s, jnp.float32)
                new[key] = {"g": jnp.asarray(ln[key]["g"], jnp.float32) * inv,
                            "b": jnp.asarray(ln[key]["b"], jnp.float32) * inv}
        lns.append(new)
    out["ln"] = lns
    return out


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


def search_smooth_alpha(
    qforward,
    flat: FlatParams,
    cfg,
    batches,
    qcfg,
    alphas=(0.0, 0.25, 0.4, 0.5, 0.6, 0.75),
    site_filter=None,
):
    """Global empirical alpha search — the honest one. Per-site analytic and
    per-site sample-scored selection were both built and MEASURED WRONG
    here: a site's local output MSE does not predict the end-to-end error
    (diffuse rounding noise partially cancels through downstream matmuls,
    while outlier-channel error at large alpha passes through coherently),
    so local scores over-pick large alphas. What a practitioner actually
    does generalizes: quantize the whole model per candidate alpha,
    evaluate the REAL deployed forward on held-out calibration data against
    fp32, keep the argmin. alpha=0 (no smoothing) is in the grid, so the
    result is never worse than plain quantization on the holdout.

    Cost: len(alphas) quantize+forward passes over the calibration set —
    offline tooling. Returns (smooth_vectors, best_alpha); smooth == {} when
    alpha=0 wins.

    site_filter(name)->bool restricts smoothing to a subset of sites (the
    filter applies INSIDE the search so candidates are scored exactly as
    they will deploy) — e.g. the LN-foldable ViT sites for block-kernel
    deployment (quant.recipe.VIT_LN_FOLDABLE)."""
    import jax.numpy as _jnp

    batches = [_jnp.asarray(b) for b in batches]
    if len(batches) >= 2:
        cal, hold = batches[:-1], batches[-1]
    else:  # single batch: split rows
        b = batches[0]
        half = max(1, b.shape[0] // 2)
        cal, hold = [b[:half]], b[half:] if b.shape[0] > 1 else b
    ref = np.asarray(qforward(ObserveCtx(flat), hold, cfg))
    amax = collect_channel_amax(qforward, flat, cfg, cal)

    from dlq_tpu.quant.model_quant import quantize_weights

    best = (np.inf, {}, 0.0)
    for alpha in alphas:
        sm = compute_smooth(flat, amax, alpha=alpha) if alpha > 0 else {}
        if sm and site_filter is not None:
            sm = {k: v for k, v in sm.items() if site_filter(k)}
        flat_s = apply_smooth(flat, sm) if sm else flat
        scales = smooth_calibrate(qforward, flat_s, cfg, cal, qcfg, sm)
        qflat = quantize_weights(flat_s, qcfg)
        dep = np.asarray(qforward(
            SmoothDeployCtx(qflat, scales, qcfg, sm), hold, cfg))
        err = float(np.linalg.norm(dep - ref) / (np.linalg.norm(ref) + 1e-12))
        if err < best[0]:
            best = (err, sm, alpha)
    return best[1], best[2]


from dlq_tpu.quant.qat import QATCtx as _QATCtx  # noqa: E402


class SmoothQATCtx(_SmoothMixin, _QATCtx):
    """QAT fine-tuning of a smoothed model: the same x/s runtime divide the
    Smooth deploy ctx applies, so training and deployment see identical
    inputs. Train on `apply_smooth`ed params; deploy via SmoothDeployCtx."""

    def __init__(self, flat, act_scales, qcfg, smooth):
        super().__init__(flat, act_scales, qcfg)
        self._set_smooth(smooth)

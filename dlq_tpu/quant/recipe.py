"""One-call PTQ recipe composing the whole toolbox:

    SmoothQuant (auto-alpha)  ->  GPTQ on the smoothed model  ->
    analytic bias correction  ->  act-scale calibration on smoothed inputs

Each stage is optional and independently tested; this module only sequences
them correctly (the ordering constraints are the subtle part: GPTQ Hessians
and activation scales must be measured on the SMOOTHED inputs, and bias
correction needs the smoothed fp32 weights as its reference).

    qflat, scales, smooth = ptq_auto(qforward, flat, cfg, batches, qcfg)
    ctx = SmoothDeployCtx(qflat, scales, qcfg, smooth)   # or DeployCtx if
    logits = qforward(ctx, x, cfg)                       # smooth == {}
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

from dlq_tpu.quant.gptq import HessianCollector, bias_correct as _bias_correct
from dlq_tpu.quant.gptq import collect_hessians, gptq_quantize_weights
from dlq_tpu.quant.model_quant import FlatParams, quantize_weights
from dlq_tpu.quant.qconfig import QConfig
from dlq_tpu.quant.smooth import (
    _SmoothMixin, apply_smooth, collect_channel_amax, compute_smooth,
    search_smooth_alpha, smooth_calibrate,
)


class SmoothHessianCollector(_SmoothMixin, HessianCollector):
    """Hessians of the smoothed inputs (x/s) — what GPTQ must see when the
    deployed model runs under a Smooth* context."""

    def __init__(self, flat, smooth):
        super().__init__(flat)
        self._set_smooth(smooth)


def ptq_auto(
    qforward,
    flat: FlatParams,
    cfg,
    batches,
    qcfg: QConfig,
    smooth: str = "auto",  # "auto" | "fixed" | "off"
    gptq: bool = True,
    bias_correct: bool = True,
    smooth_site_filter=None,
) -> Tuple[FlatParams, Dict[str, Any], Dict[str, Any]]:
    """Returns (qflat, act_scales, smooth_vectors). Deploy with
    SmoothDeployCtx(qflat, act_scales, qcfg, smooth_vectors); an empty
    smooth dict makes that identical to DeployCtx.

    smooth_site_filter(name)->bool restricts which sites get smoothing
    vectors — e.g. VIT_LN_FOLDABLE so the result deploys through the fused
    ViT block kernels (smoothing folded into the LN gains at pack time)."""
    batches = list(batches)
    sm: Dict[str, Any] = {}
    if smooth != "off" and not qcfg.weight_only:
        if smooth == "auto":
            # global empirical search: real quantized forward per candidate
            # alpha on held-out calibration data (see search_smooth_alpha
            # for why per-site local scoring was measured wrong)
            sm, _ = search_smooth_alpha(qforward, flat, cfg, batches, qcfg,
                                        site_filter=smooth_site_filter)
        else:
            amax = collect_channel_amax(qforward, flat, cfg, batches)
            sm = compute_smooth(flat, amax)
            if smooth_site_filter is not None:
                sm = {k: v for k, v in sm.items() if smooth_site_filter(k)}
    flat_s = apply_smooth(flat, sm) if sm else flat

    col = None
    if gptq or bias_correct:
        col = SmoothHessianCollector(flat_s, sm)
        import jax.numpy as jnp

        for x in batches:
            qforward(col, jnp.asarray(x), cfg)

    qflat = (gptq_quantize_weights(flat_s, qcfg, col) if gptq
             else quantize_weights(flat_s, qcfg))
    if bias_correct:
        qflat = _bias_correct(flat_s, qflat, col)

    scales = None
    if not qcfg.weight_only:
        scales = smooth_calibrate(qforward, flat_s, cfg, batches, qcfg, sm)
    return qflat, scales, sm


def VIT_LN_FOLDABLE(site: str) -> bool:
    """ViT sites whose smoothing vector folds EXACTLY into the preceding
    LayerNorm's affine (g/s, b/s): qkv (after ln1) and fc1 (after ln2).
    proj/fc2 inputs come straight from attention/GELU — no affine to fold —
    so restricting smoothing here is what makes a ptq_auto model deployable
    through the fused block kernels (pack_vit_blocks_*(smooth=sm))."""
    return site.endswith(".qkv") or site.endswith(".fc1")

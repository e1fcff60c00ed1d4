"""Per-layer quantization-error harness.

The BASELINE.json requirement: "the Excel_logger accuracy-tracking workflow
becomes a structured per-layer quant-error harness". Combines the
reference's two methodologies — per-stage max_abs/mean_abs/cosine diffing
(`tools/diag_e2e_compare.py:15-41`) and top-1 agreement benching
(`tools/bench_fp32_vs_torch.py:137-146`) — into one report over the
quantized engine, persisted through RunLogger.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import numpy as np

from dlq_tpu import numerics
from dlq_tpu.runlog import RunLogger


def quant_error_report(
    fp32_taps_fn: Callable[[Any], Any],
    q_taps_fn: Callable[[Any], Any],
    batches,
    logger: Optional[RunLogger] = None,
    params_info: Optional[Dict[str, Any]] = None,
) -> Dict[str, Any]:
    """Run both engines with taps over batches; per-stage diff + accuracy.

    *_taps_fn: x -> (logits, {stage: activation}).
    Returns {stages: {name: diff...}, top1_agreement, top5_agreement,
    logits_cosine, worst_stage}.
    """
    report = numerics.StageReport()
    agree1, agree5, cos, n = 0.0, 0.0, 0.0, 0
    stage_accum: Dict[str, numerics.Diff] = {}
    for x in batches:
        lf, tf = fp32_taps_fn(x)
        lq, tq = q_taps_fn(x)
        lf, lq = np.asarray(lf), np.asarray(lq)
        b = len(lf)
        agree1 += numerics.top1_agreement(lq, lf) * b
        agree5 += numerics.topk_agreement(lq, lf, 5) * b
        cos += numerics.diff(lq, lf).cosine * b
        n += b
        for name in tf.keys() & tq.keys():  # shared stages only
            d = numerics.diff(np.asarray(tq[name]), np.asarray(tf[name]))
            prev = stage_accum.get(name)
            if prev is None or d.max_abs > prev.max_abs:
                stage_accum[name] = d
    report.stages = stage_accum
    out = {
        "stages": report.to_json(),
        "worst_stage": report.worst(),
        "top1_agreement": agree1 / n,
        "top5_agreement": agree5 / n,
        "logits_cosine": cos / n,
        "images": n,
    }
    if logger is not None:
        flat_metrics = {
            "top1_agreement": out["top1_agreement"],
            "top5_agreement": out["top5_agreement"],
            "logits_cosine": out["logits_cosine"],
        }
        for s, d in out["stages"].items():
            flat_metrics[f"{s}_max_abs"] = d["max_abs"]
            flat_metrics[f"{s}_cosine"] = d["cosine"]
        logger.log(flat_metrics, params=params_info, extra={"worst_stage": out["worst_stage"]})
    return out


def labeled_accuracy_delta(
    fp32_logits: np.ndarray, q_logits: np.ndarray, labels: np.ndarray
) -> Dict[str, float]:
    """When labels exist: absolute top-1 for both paths + the delta that the
    BASELINE gate (<= 0.5% at INT8) is scored on."""
    t1f = float(np.mean(np.argmax(fp32_logits, -1) == labels))
    t1q = float(np.mean(np.argmax(q_logits, -1) == labels))
    return {"top1_fp32": t1f, "top1_quant": t1q, "delta_top1": t1f - t1q}

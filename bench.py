"""Headline benchmark: INT8 ResNet-18 images/sec/chip (BASELINE.json metric).

Prints ONE JSON line:
  {"metric": "resnet18_int8_images_per_sec_per_chip", "value": N,
   "unit": "img/s", "vs_baseline": <int8-vs-fp32 speedup on same chip>, ...}

vs_baseline is the int8/fp32 throughput ratio on the same hardware — the
reference publishes no absolute throughput (BASELINE.md: logs git-ignored),
so the speedup over our own fp32 path is the honest comparable, plus the
accuracy deltas the reference's methodology tracks (top-1 agreement).
"""

import json
import os
import sys
import time

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()  # DLQ_PLATFORM=cpu escapes the forced TPU backend (CI smoke)
    t0 = time.time()
    batch = int(os.environ.get("BENCH_BATCH", "384"))  # b384 peak: 48.2k vs b256 47.4k vs b512 46.3k (BENCH_NOTES)
    iters = int(os.environ.get("BENCH_ITERS", "20"))
    size = 224

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.quant.model_quant import ObserveCtx
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, size, size, 3)), jnp.float32)]
    x = rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32)

    # fp32 folded engine (baseline on this chip)
    def fp32_fwd(p, xb):
        return qforward(ObserveCtx(p), xb, cfg)

    eng_fp32 = Engine(fp32_fwd, flat, batch=batch, name="resnet18_fp32")
    r_fp32 = device_time_fn(fp32_fwd, eng_fp32.params, jnp.asarray(x), perturb_arg=1,
                            n_small=2, n_big=2 + iters)

    # bf16 engine (the strongest non-quantized baseline on MXU)
    import jax.tree_util as jtu

    flat_bf16 = jtu.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
        flat,
    )

    def bf16_fwd(p, xb):
        return qforward(ObserveCtx(p), xb.astype(jnp.bfloat16), cfg).astype(jnp.float32)

    r_bf16 = device_time_fn(bf16_fwd, flat_bf16, jnp.asarray(x), perturb_arg=1,
                            n_small=2, n_big=2 + iters)

    # int8 engine
    eng_int8 = Engine.quantized(
        qforward, flat, cfg, INT8_PER_CHANNEL, calib_batches=calib,
        batch=batch, name="resnet18_int8",
    )
    # headline: the fully-int8-interchange deploy path (FullFusedCtx) —
    # int8 tensors between every op, TFLite-style int residual adds
    from dlq_tpu.models.resnet import qforward_fused2
    from dlq_tpu.quant.model_quant import DeployCtx, FullFusedCtx

    def int8_fwd(p, xb):
        return qforward_fused2(FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL), xb, cfg)

    def int8_deploy_fwd(p, xb):
        return qforward(DeployCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL), xb, cfg)

    # headline defense (VERDICT r3 #1): one cold chained-slope run regressed
    # the scoreboard ~4% on relay noise. Repeat the int8 slope measurement
    # >=3x in-process (first call compiles the chains; repeats reuse the jit
    # cache), report the median of medians + the [lo, hi] band so a noisy
    # sample can't masquerade as a code regression. fp32/bf16 stay single-pass.
    int8_reps = int(os.environ.get("BENCH_INT8_REPS", "3"))
    int8_runs = [
        device_time_fn(int8_fwd, eng_int8.params, jnp.asarray(x), perturb_arg=1,
                       n_small=2, n_big=2 + iters)
        for _ in range(max(1, int8_reps))
    ]
    int8_ms = sorted(r["ms_median"] for r in int8_runs)
    ms_int8 = int8_ms[len(int8_ms) // 2] if len(int8_ms) % 2 else 0.5 * (
        int8_ms[len(int8_ms) // 2 - 1] + int8_ms[len(int8_ms) // 2])
    r_int8 = {"ms_median": ms_int8}

    ips_int8 = batch / (r_int8["ms_median"] / 1e3)
    ips_fp32 = batch / (r_fp32["ms_median"] / 1e3)
    band_img_s = [round(batch / (int8_ms[-1] / 1e3), 2),
                  round(batch / (int8_ms[0] / 1e3), 2)]

    # model-level MFU: ops/img from XLA's cost analysis of the fp32 forward
    # (canonical op count — conv/dense MACs dominate; elementwise included),
    # confronted against the chip int8 peak (VERDICT r1 #7)
    from dlq_tpu.bench.roofline import PEAKS, detect_chip

    try:
        cost = (jax.jit(fp32_fwd)
                .lower(eng_fp32.params, jnp.asarray(x)).compile()
                .cost_analysis())
        if isinstance(cost, list):  # older jax returns [dict]
            cost = cost[0]
        flops_batch = float(cost.get("flops", 0.0))
    except Exception:
        flops_batch = 0.0
    chip = detect_chip()
    ops_per_img = flops_batch / batch if flops_batch else 0.0
    tops_eff = ops_per_img * ips_int8 / 1e12
    pct_peak = (tops_eff * 1e12 / PEAKS[chip]["int8"] * 100.0
                if chip in PEAKS else 0.0)

    # accuracy: top-1 agreement int8 (fused path) vs fp32 on the bench batch
    logits_fp32 = np.asarray(eng_fp32(x))
    logits_int8 = np.asarray(jax.jit(int8_fwd)(eng_int8.params, jnp.asarray(x)))
    agree = numerics.top1_agreement(logits_int8, logits_fp32)
    cos = numerics.diff(logits_int8, logits_fp32).cosine

    # loud-fail gates (VERDICT r2 #8): the headline is only meaningful if
    # the int8 path still matches fp32 argmax-for-argmax on this batch and
    # the MFU denominator was actually computed
    fail = None
    if agree < 1.0:
        fail = (f"top-1 agreement {agree} < 1.0 — int8 fused path diverged "
                "from fp32 (backend miscompile or quant regression)")
    elif cos < 0.999:
        fail = f"logits cosine {cos:.5f} < 0.999"
    elif flops_batch == 0.0:
        fail = "cost_analysis returned no flops — MFU fields are vacuous"

    print(json.dumps({
        "metric": "resnet18_int8_images_per_sec_per_chip",
        "value": round(ips_int8, 2),
        "unit": "img/s",
        "band_img_s": band_img_s,
        "int8_slope_reps": len(int8_ms),
        "vs_baseline": round(ips_int8 / ips_fp32, 3),
        "fp32_images_per_sec": round(ips_fp32, 2),
        "bf16_images_per_sec": round(batch / (r_bf16["ms_median"] / 1e3), 2),
        "int8_ms_per_batch": round(r_int8["ms_median"], 3),
        "fp32_ms_per_batch": round(r_fp32["ms_median"], 3),
        "batch": batch,
        "model_gops_per_img": round(ops_per_img / 1e9, 3),
        "model_tops_effective": round(tops_eff, 1),
        "pct_int8_peak": round(pct_peak, 1),
        "top1_agreement_int8_vs_fp32": agree,
        "logits_cosine": round(cos, 6),
        "device": str(jax.devices()[0]),
        "wall_s": round(time.time() - t0, 1),
        **({"FAILED": fail} if fail else {}),
    }))
    if fail:
        print(f"BENCH FAILED: {fail}", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())

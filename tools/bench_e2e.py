#!/usr/bin/env python
"""End-to-end accuracy/perf bench: fp32 vs quantized engine over a dataset.

The reference's step9 harness (`tools/bench_fp32_vs_torch_e2e.py`) rebuilt
around a persistent engine — no per-image process spawn, no per-image weight
reload (the documented flaw, SURVEY §3.4). Reports top-1 agreement, logits
cosine, per-stage worst error, img/s (slope-timed), and logs via RunLogger.

Usage:
  python tools/bench_e2e.py --manifest exports/resnet18 --qmanifest exports/resnet18_int8 \
      [--images DIR | --synthetic 256] [--batch 64]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True, help="fp32 weight store")
    ap.add_argument("--qmanifest", required=True, help="quantized store")
    ap.add_argument("--images", default=None, help="directory of images")
    ap.add_argument("--synthetic", type=int, default=256)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--runlog", default="runlogs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.manifest import Manifest
    from dlq_tpu.quant.model_quant import DeployCtx, ObserveCtx
    from dlq_tpu.quant.store import load_quantized
    from dlq_tpu.runlog import RunLogger
    from dlq_tpu.timing import device_time_fn
    from tools.quantize_model import get_model_bundle

    man = Manifest.load(args.manifest)
    cfg, params, flat, qforward = get_model_bundle(man)
    qflat, act_scales, qcfg, _extras = load_quantized(args.qmanifest)

    if args.images:
        from dlq_tpu.native import preprocess_batch_u8
        from PIL import Image

        paths = sorted(
            os.path.join(args.images, f) for f in os.listdir(args.images)
            if os.path.splitext(f)[1].lower() in (".jpg", ".jpeg", ".png")
        )
        imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
        data = preprocess_batch_u8(imgs)
    else:
        size = 32 if getattr(cfg, "small_input", False) else getattr(cfg, "image_size", 224)
        shape = ((args.synthetic, cfg.in_dim) if man.model == "mlp"
                 else (args.synthetic, size, size, 3))
        data = np.random.default_rng(0).normal(0, 1, shape).astype(np.float32)

    fp32_fn = jax.jit(lambda p, xb: qforward(ObserveCtx(p), xb, cfg))
    q_fn = jax.jit(lambda p, xb: qforward(DeployCtx(p["qflat"], p["scales"], qcfg), xb, cfg))
    qpayload = {"qflat": qflat, "scales": act_scales}

    # accuracy sweep (batched, persistent engine)
    agree1 = agree5 = cos = 0.0
    n = 0
    for i in range(0, len(data) - args.batch + 1, args.batch):
        xb = jnp.asarray(data[i : i + args.batch])
        lf = np.asarray(fp32_fn(flat, xb))
        lq = np.asarray(q_fn(qpayload, xb))
        agree1 += numerics.top1_agreement(lq, lf) * len(lf)
        agree5 += numerics.topk_agreement(lq, lf, 5) * len(lf)
        cos += numerics.diff(lq, lf).cosine * len(lf)
        n += len(lf)

    # perf (slope-timed)
    xb = jnp.asarray(data[: args.batch])
    t_q = device_time_fn(q_fn, qpayload, xb, perturb_arg=1, n_small=2, n_big=2 + args.iters)
    t_f = device_time_fn(fp32_fn, flat, xb, perturb_arg=1, n_small=2, n_big=2 + args.iters)
    ips_q = args.batch / (t_q["ms_median"] / 1e3)
    ips_f = args.batch / (t_f["ms_median"] / 1e3)

    out = {
        "model": man.model,
        "images": n,
        "top1_agreement": agree1 / n,
        "top5_agreement": agree5 / n,
        "logits_cosine": cos / n,
        "quant_img_per_s": round(ips_q, 1),
        "fp32_img_per_s": round(ips_f, 1),
        "speedup": round(ips_q / ips_f, 3),
        "quant_ms_per_batch": round(t_q["ms_median"], 3),
        "device": str(jax.devices()[0]),
    }
    RunLogger(root=args.runlog, script="bench_e2e.py").log(
        out, params={"manifest": args.manifest, "qmanifest": args.qmanifest,
                     "batch": args.batch})
    print(json.dumps(out))


if __name__ == "__main__":
    main()

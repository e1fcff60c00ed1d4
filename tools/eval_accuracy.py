#!/usr/bin/env python
"""Labeled top-1/top-5 evaluation: fp32 vs quantized engines on a dataset.

Computes the BASELINE gate directly (INT8 within 0.5% top-1 of FP32) when a
labeled dataset is available:
  * --imagenet DIR: ImageFolder layout (DIR/<class>/*.jpg, classes sorted)
  * --cifar DIR:    CIFAR-10 python batches
  * neither:        synthetic surrogate task (structural check only)

Usage:
  python tools/eval_accuracy.py --manifest exports/r18 --qmanifest exports/r18_int8 \
      [--imagenet /data/imagenet/val | --cifar /data/cifar10] [--limit 1000]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_imagefolder(root, limit, size):
    from dlq_tpu.native import preprocess_batch_u8
    from PIL import Image

    classes = sorted(d for d in os.listdir(root) if os.path.isdir(os.path.join(root, d)))
    paths, labels = [], []
    for ci, c in enumerate(classes):
        for f in sorted(os.listdir(os.path.join(root, c))):
            if os.path.splitext(f)[1].lower() in (".jpg", ".jpeg", ".png"):
                paths.append(os.path.join(root, c, f))
                labels.append(ci)
    if limit:
        idx = np.random.default_rng(0).permutation(len(paths))[:limit]
        paths = [paths[i] for i in idx]
        labels = [labels[i] for i in idx]
    imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
    return preprocess_batch_u8(imgs, size=size), np.asarray(labels, np.int32)


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--qmanifest", required=True)
    ap.add_argument("--imagenet", default=None)
    ap.add_argument("--cifar", default=None)
    ap.add_argument("--limit", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--runlog", default="runlogs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu.manifest import Manifest
    from dlq_tpu.quant.error_report import labeled_accuracy_delta
    from dlq_tpu.quant.model_quant import DeployCtx, ObserveCtx
    from dlq_tpu.quant.store import load_quantized
    from dlq_tpu.runlog import RunLogger
    from tools.quantize_model import get_model_bundle

    man = Manifest.load(args.manifest)
    cfg, params, flat, qforward = get_model_bundle(man)
    qflat, act_scales, qcfg, _ = load_quantized(args.qmanifest)

    size = 32 if getattr(cfg, "small_input", False) else getattr(cfg, "image_size", 224)
    if args.imagenet:
        X, Y = load_imagefolder(args.imagenet, args.limit, size)
        source = "imagenet"
    elif args.cifar:
        from dlq_tpu.data.cifar10 import load_cifar10

        X, Y = load_cifar10(args.cifar, "test")
        X, Y = X[: args.limit], Y[: args.limit]
        source = "cifar10"
    else:
        from dlq_tpu.data.cifar10 import synthetic_cifar10

        X, Y = synthetic_cifar10(args.limit, seed=1)
        if size != 32:
            raise SystemExit("synthetic eval needs a small_input model")
        source = "synthetic"

    fp32_fn = jax.jit(lambda p, xb: qforward(ObserveCtx(p), xb, cfg))
    q_fn = jax.jit(lambda p, xb: qforward(DeployCtx(p["q"], p["s"], qcfg), xb, cfg))
    pay = {"q": qflat, "s": act_scales}
    lf, lq = [], []
    n = (len(X) // args.batch) * args.batch
    for i in range(0, n, args.batch):
        xb = jnp.asarray(X[i : i + args.batch])
        lf.append(np.asarray(fp32_fn(flat, xb)))
        lq.append(np.asarray(q_fn(pay, xb)))
    lf = np.concatenate(lf)
    lq = np.concatenate(lq)
    out = labeled_accuracy_delta(lf, lq, Y[:n])
    out.update({"images": n, "source": source,
                "gate_0p5pct": bool(abs(out["delta_top1"]) <= 0.005)})
    RunLogger(root=args.runlog, script="eval_accuracy.py").log(
        out, params={"manifest": args.manifest, "qmanifest": args.qmanifest})
    print(json.dumps(out))


if __name__ == "__main__":
    main()

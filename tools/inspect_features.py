#!/usr/bin/env python
"""Feature-map inspection CLI (CheckFeaturemap capability).

Runs a manifest model with taps on an image (or synthetic input), writes
top-K-energy channel grid PNGs per stage + a JSON report.

Usage:
  python tools/inspect_features.py --manifest exports/resnet18 \
      [--image cat.jpg] [--out feat_out] [--topk 16]
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
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--image", default=None)
    ap.add_argument("--out", default="feat_out")
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--ncols", type=int, default=4)
    args = ap.parse_args()

    import jax

    from dlq_tpu.inspect_fm import inspect_taps
    from dlq_tpu.interop.manifest_io import load_params
    from dlq_tpu.manifest import Manifest
    from dlq_tpu.models import get_model

    man = Manifest.load(args.manifest)
    mcfg = man.meta.get("config", {})
    kw = {}
    if "num_classes" in mcfg:
        kw["num_classes"] = mcfg["num_classes"]
    if mcfg.get("small_input") and man.model.startswith(("resnet", "mobilenet")):
        kw["small_input"] = True
    cfg, init, forward = get_model(man.model, **kw) if man.model != "mlp" else get_model(man.model)
    params = load_params(args.manifest, init(jax.random.PRNGKey(0), cfg))

    size = 32 if getattr(cfg, "small_input", False) else getattr(cfg, "image_size", 224)
    if args.image:
        from dlq_tpu.data.preprocess import imagenet_preprocess_np
        from PIL import Image

        x = imagenet_preprocess_np(Image.open(args.image), size=size)
    else:
        x = np.random.default_rng(0).normal(0, 1, (1, size, size, 3)).astype(np.float32)

    _, taps = jax.jit(lambda p, xx: forward(p, xx, cfg, taps=True))(params, x)
    report = inspect_taps(taps, args.out, topk=args.topk, ncols=args.ncols)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump(report, f, indent=1)
    for stage, r in report.items():
        print(f"[OK] {stage:<10} shape={r['shape']} top_channels={r['channels'][:4]}... -> {r['png']}")


if __name__ == "__main__":
    main()

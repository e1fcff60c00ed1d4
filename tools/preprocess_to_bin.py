#!/usr/bin/env python
"""Preprocess images to raw fp32 NHWC .bin (the reference's
tools/preprocess_to_bin.py capability, batched + native-accelerated).

Usage:
  python tools/preprocess_to_bin.py --images DIR --out batch.bin \
      [--size 224] [--resize 256] [--limit 0] [--native]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--resize", type=int, default=256)
    ap.add_argument("--limit", type=int, default=0)
    ap.add_argument("--native", action="store_true",
                    help="use the threaded C++ preprocess (libdlqio)")
    args = ap.parse_args()

    from PIL import Image

    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    paths = sorted(
        os.path.join(args.images, f) for f in os.listdir(args.images)
        if os.path.splitext(f)[1].lower() in exts
    )
    if args.limit:
        paths = paths[: args.limit]
    if not paths:
        raise SystemExit(f"no images in {args.images}")

    if args.native:
        from dlq_tpu.native import preprocess_batch_u8

        imgs = [np.asarray(Image.open(p).convert("RGB")) for p in paths]
        batch = preprocess_batch_u8(imgs, resize_to=args.resize, size=args.size)
    else:
        from dlq_tpu.data.preprocess import imagenet_preprocess_np

        batch = np.concatenate(
            [imagenet_preprocess_np(Image.open(p), args.size, args.resize) for p in paths]
        )
    batch.tofile(args.out)
    with open(args.out + ".json", "w") as f:
        json.dump({"shape": list(batch.shape), "paths": [os.path.basename(p) for p in paths]}, f)
    print(f"[OK] {batch.shape} -> {args.out} ({batch.nbytes/1e6:.1f} MB)")


if __name__ == "__main__":
    main()

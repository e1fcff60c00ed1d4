"""Step9-scale real-image benchmark: 500 JPEG files through the FULL ingest
path (decode -> native threaded preprocess -> persistent engine), fp32 vs
int8, with top-1 agreement and ingest/compute throughput.

The reference's step9 runs 500 ImageNet-val JPEGs per-image through a
subprocess (`tools/bench_fp32_vs_torch_e2e.py:90-132`) and reports top-1
agreement + ms/img + speedup; its `_fast` variant batches to amortize
process spawn (`bench_fp32_vs_torch_fast.py:92-134`). This is the
persistent-engine equivalent at the same image count, with the ingest
(JPEG decode + resize/crop/normalize) measured separately from the engine
forward — isolating the two costs the reference conflated. No ImageNet is
downloadable here, so the corpus is synthesized JPEGs (class-dependent
color statistics, variable sizes) written as real files.

Usage:
  python tools/bench_real_images.py [--images 500] [--batch 384]
      [--dir /tmp/dlq_imagefolder] [--runlog runlogs]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def make_corpus(root: str, n_images: int, classes: int = 10, seed: int = 0):
    """Synthesize an ImageFolder of real JPEG files with class-dependent
    color statistics and varied (reference-like) sizes."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    per = -(-n_images // classes)
    count = 0
    for ci in range(classes):
        d = os.path.join(root, f"class_{ci:03d}")
        os.makedirs(d, exist_ok=True)
        for i in range(per):
            if count >= n_images:
                break
            h = int(rng.integers(256, 520))
            w = int(rng.integers(256, 520))
            base = np.zeros((h, w, 3), np.uint8)
            base[..., ci % 3] = 90 + 15 * (ci % 8)
            # low-frequency structure + noise so JPEG has real work to do
            yy, xx = np.mgrid[0:h, 0:w]
            wave = (40 * np.sin(xx / (10 + ci)) * np.cos(yy / (14 + ci)))
            img = base.astype(np.int32) + wave[..., None].astype(np.int32)
            img = img + rng.integers(0, 50, img.shape)
            Image.fromarray(np.clip(img, 0, 255).astype(np.uint8)).save(
                os.path.join(d, f"img_{i:04d}.jpg"), quality=90)
            count += 1
    return count


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=500)
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--dir", default="/tmp/dlq_imagefolder")
    ap.add_argument("--runlog", default="runlogs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, ObserveCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.runlog import RunLogger
    from tools.eval_accuracy import load_imagefolder

    _emit(device=str(jax.devices()[0]))

    if not os.path.isdir(args.dir) or not os.listdir(args.dir):
        n = make_corpus(args.dir, args.images)
        _emit(stage="corpus", images=n, dir=args.dir)

    # --- ingest: JPEG decode (PIL) + native threaded preprocess, timed ---
    t0 = time.time()
    X, Y = load_imagefolder(args.dir, limit=args.images, size=224)
    ingest_s = time.time() - t0
    _emit(stage="ingest", images=len(X), seconds=round(ingest_s, 2),
          images_per_sec=round(len(X) / ingest_s, 1))

    # --- engines (persistent, compiled once — the reference flaw fixed) ---
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    calib = [jnp.asarray(X[:64])]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    pay = {"q": qflat, "s": scales}

    fp32_fn = jax.jit(lambda p, xb: qforward(ObserveCtx(p), xb, cfg))
    int8_fn = jax.jit(lambda p, xb: qforward_fused2(
        FullFusedCtx(p["q"], p["s"], INT8_PER_CHANNEL), xb, cfg))

    B = args.batch
    n = len(X)
    pad = (-n) % B
    Xp = np.concatenate([X, X[:pad]]) if pad else X

    from dlq_tpu.timing import device_time_fn

    def run(fn, payload):
        # logits over all batches (for agreement), then DEVICE time via the
        # chained-slope method — wall bracketing through the relay is
        # meaningless (block_until_ready is not a barrier there; the first
        # run of this tool produced 0.75 vs 18 ms/img nonsense that way)
        outs = [np.asarray(fn(payload, jnp.asarray(Xp[i:i + B])))
                for i in range(0, len(Xp), B)]
        r = device_time_fn(fn, payload, jnp.asarray(Xp[:B]), perturb_arg=1,
                           n_small=2, n_big=10)
        dt = r["ms_median"] / 1e3 * (len(Xp) / B)
        return np.concatenate(outs)[:n], dt

    lf, t_fp32 = run(fp32_fn, flat)
    lq, t_int8 = run(int8_fn, pay)

    agree = numerics.top1_agreement(lq, lf)
    cos = float(numerics.diff(lq, lf).cosine)
    out = {
        "images": n,
        "ingest_images_per_sec": round(n / ingest_s, 1),
        "fp32_ms_per_img": round(t_fp32 / n * 1e3, 4),
        "int8_ms_per_img": round(t_int8 / n * 1e3, 4),
        "fp32_images_per_sec": round(n / t_fp32, 1),
        "int8_images_per_sec": round(n / t_int8, 1),
        "speedup_int8_vs_fp32": round(t_fp32 / t_int8, 3),
        "top1_agreement": agree,
        "logits_cosine": round(cos, 6),
        # the reference's per-image summary shape (bench_fp32_vs_torch_e2e
        # :127-132): agree%, torch_ms, cuda_ms, speedup
        "summary": f"[E2E-500] agree_top1={agree*100:.1f}% "
                   f"fp32_ms={t_fp32 / n * 1e3:.3f} int8_ms={t_int8 / n * 1e3:.3f} "
                   f"speedup={t_fp32 / t_int8:.2f}x",
    }
    _emit(stage="summary", **out)
    RunLogger(root=args.runlog, script="bench_real_images.py").log(
        {k: v for k, v in out.items() if isinstance(v, (int, float))},
        params={"images": n, "batch": B, "model": "resnet18",
                "ctx": "fused2"})
    if agree < 1.0:
        print(f"WARNING: top-1 agreement {agree} < 1.0", file=sys.stderr)
        return 2
    return 0


if __name__ == "__main__":
    sys.exit(main())

#!/usr/bin/env python
"""PTQ CLI: fp32 manifest -> deployable quantized manifest.

The quantization pipeline the reference designed its manifest for
(`reports/Step1.md:92`) as one command: load fp32 weights, fold BN,
calibrate activations on .bin batches (or synthetic data), quantize, and
write the quantized store with per-tensor `quant` blocks.

Usage:
  python tools/quantize_model.py --manifest exports/resnet18 --out exports/resnet18_int8 \
      [--scheme int8_pc|int8_pt|int4_wo] [--calib calib.bin --calib_shape 8,224,224,3] \
      [--method minmax|percentile|mse] [--calib_batches 4]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCHEMES = {
    "int8_pc": "INT8_PER_CHANNEL",
    "int8_pt": "INT8_PER_TENSOR",
    "int4_wo": "INT4_WEIGHT_ONLY_G128",
    "int4_wo_pc": "INT4_WEIGHT_ONLY_PER_OC",  # block-kernel-friendly W4
    "int4a8": "INT4A8_PER_CHANNEL",
}


def get_model_bundle(man):
    """(cfg, init, qforward, fold_fn) for the manifest's model family."""
    import jax

    from dlq_tpu.interop.manifest_io import load_params
    from dlq_tpu.models import get_model

    mcfg = man.meta.get("config", {})
    kw = {}
    if "num_classes" in mcfg:
        kw["num_classes"] = mcfg["num_classes"]
    if mcfg.get("small_input") and man.model.startswith(("resnet", "mobilenet")):
        kw["small_input"] = True
    cfg, init, _ = get_model(man.model, **kw) if man.model != "mlp" else get_model(man.model)
    params = load_params(man.root, init(jax.random.PRNGKey(0), cfg))

    if man.model.startswith("resnet"):
        from dlq_tpu.models.resnet import flatten_folded, fold_resnet, qforward

        flat = flatten_folded(fold_resnet(params, cfg))
        return cfg, params, flat, qforward
    if man.model == "mobilenetv2":
        from dlq_tpu.models.mobilenetv2 import block_meta, fold_mobilenetv2, make_qforward

        return cfg, params, fold_mobilenetv2(params), make_qforward(block_meta(cfg))
    if man.model == "mlp":
        from dlq_tpu.models.mlp import flatten_params, qforward

        return cfg, params, flatten_params(params), qforward
    if man.model == "lenet5":
        from dlq_tpu.models.lenet import flatten_params, qforward

        return cfg, params, flatten_params(params), qforward
    if man.model == "deit_tiny":
        from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras

        return cfg, params, flatten_vit(params), make_qforward(
            vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim
        )
    raise SystemExit(f"unsupported model {man.model}")


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--scheme", choices=list(SCHEMES), default="int8_pc")
    ap.add_argument("--method", choices=["minmax", "percentile", "mse"], default="minmax")
    ap.add_argument("--percentile", type=float, default=99.99)
    ap.add_argument("--calib", default=None, help="fp32 .bin of calibration inputs")
    ap.add_argument("--calib_shape", default=None, help="e.g. 8,224,224,3")
    ap.add_argument("--calib_batches", type=int, default=4)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--gptq", action="store_true",
                    help="Hessian-aware rounding (quant/gptq.py) instead of "
                         "round-to-nearest; ~5x lower int4 output error")
    ap.add_argument("--bias-correct", action="store_true",
                    help="absorb the quantization-induced output-mean shift "
                         "into biases (analytic, composes with --gptq)")
    ap.add_argument("--auto", action="store_true",
                    help="the composed ptq_auto recipe (SmoothQuant auto-"
                         "alpha restricted to LN-foldable sites + GPTQ + "
                         "bias correction); ViT-family manifests only — the "
                         "smoothing folds into the stored LN affines so the "
                         "artifact stays self-contained. Conv models: use "
                         "--gptq --bias-correct (their smoothing needs the "
                         "runtime SmoothDeployCtx divide)")
    args = ap.parse_args()

    import dataclasses

    import jax.numpy as jnp

    from dlq_tpu.manifest import Manifest
    from dlq_tpu.quant import qconfig as QC
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.store import save_quantized

    man = Manifest.load(args.manifest)
    cfg, params, flat, qforward = get_model_bundle(man)
    qcfg = dataclasses.replace(
        getattr(QC, SCHEMES[args.scheme]),
        calibration=args.method, percentile=args.percentile,
    )

    batches = []
    # --auto composes smoothing + GPTQ + bias-correct, all of which need
    # calibration activations even on a weight-only scheme (ADVICE r4 #2:
    # without this, --auto int4_wo silently degraded to plain RTN)
    need_batches = (not qcfg.weight_only) or args.gptq or args.bias_correct or args.auto
    if not need_batches:
        pass
    elif args.calib:
        shape = tuple(int(s) for s in args.calib_shape.split(","))
        data = np.fromfile(args.calib, np.float32).reshape(shape)
        batches = [jnp.asarray(data[i : i + args.batch])
                   for i in range(0, len(data), args.batch)]
    else:
        # synthetic normalized batches (document the fallback in meta)
        rng = np.random.default_rng(0)
        if man.model == "mlp":
            shape = (args.batch, cfg.in_dim)
        elif man.model == "lenet5":
            shape = (args.batch, 28, 28, cfg.in_channels)
        else:
            size = 32 if getattr(cfg, "small_input", False) else getattr(cfg, "image_size", 224)
            shape = (args.batch, size, size, 3)
        batches = [jnp.asarray(rng.normal(0, 1, shape), jnp.float32)
                   for _ in range(args.calib_batches)]

    if args.auto:
        if man.model != "deit_tiny":
            raise SystemExit(
                "--auto is ViT-family only (LN-foldable smoothing); for "
                f"{man.model} use --gptq --bias-correct")
        from dlq_tpu.models.vit import vit_extras
        from dlq_tpu.quant.recipe import VIT_LN_FOLDABLE, ptq_auto
        from dlq_tpu.quant.smooth import fold_smooth_into_ln_extras

        qflat, act_scales, sm = ptq_auto(
            qforward, flat, cfg, batches, qcfg,
            smooth_site_filter=VIT_LN_FOLDABLE)
        extras = fold_smooth_into_ln_extras(vit_extras(params), sm)
        path = save_quantized(args.out, man.model, qflat, act_scales, qcfg,
                              extras=extras,
                              meta={"source_manifest": os.path.abspath(args.manifest),
                                    "config": man.meta.get("config", {}),
                                    "calib": args.calib or "synthetic",
                                    "rounding": "ptq_auto",
                                    "smooth_sites": sorted(sm)})
        q_bytes = sum(p["qw"].nbytes for p in qflat.values())
        print(f"[OK] {args.scheme} ptq_auto ({len(sm)} LN-folded smooth "
              f"sites) -> {path}  weights {q_bytes/1e6:.1f} MB")
        return

    act_scales = None
    if not qcfg.weight_only:
        act_scales = calibrate(make_sites_fn(qforward, cfg), flat, batches, qcfg)

    col = None
    if args.gptq or args.bias_correct:
        from dlq_tpu.quant.gptq import collect_hessians

        col = collect_hessians(qforward, flat, cfg, batches)
    if args.gptq:
        from dlq_tpu.quant.gptq import gptq_quantize_weights

        qflat = gptq_quantize_weights(flat, qcfg, col)
    else:
        qflat = quantize_weights(flat, qcfg)
    if args.bias_correct:
        from dlq_tpu.quant.gptq import bias_correct

        qflat = bias_correct(flat, qflat, col)
    extras = None
    if man.model == "deit_tiny":
        from dlq_tpu.models.vit import vit_extras

        extras = vit_extras(params)
    path = save_quantized(args.out, man.model, qflat, act_scales, qcfg,
                          extras=extras,
                          meta={"source_manifest": os.path.abspath(args.manifest),
                                "config": man.meta.get("config", {}),
                                "calib": args.calib or "synthetic",
                                "rounding": "gptq" if args.gptq else "rtn"})
    fp32_bytes = sum(int(np.prod(p["qw"].layout_shape)) * 4 for p in qflat.values())
    q_bytes = sum(p["qw"].nbytes for p in qflat.values())
    print(f"[OK] {args.scheme} ({args.method}) -> {path}  "
          f"weights {fp32_bytes/1e6:.1f} MB -> {q_bytes/1e6:.1f} MB "
          f"({fp32_bytes/q_bytes:.2f}x smaller)")


if __name__ == "__main__":
    main()

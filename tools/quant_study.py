#!/usr/bin/env python
"""Quantization accuracy study: every scheme x calibration method x model.

The per-layer error harness (quant/error_report.py) run as a survey — the
deliverable the reference's Excel-logger workflow was building toward: one
table of accuracy degradation per recipe, persisted via RunLogger (jsonl +
xlsx export).

Usage:
  DLQ_PLATFORM=cpu python tools/quant_study.py [--model resnet18] [--n 64] [--runlog runlogs]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet18",
                    choices=["resnet18", "mlp", "lenet5", "mobilenetv2", "deit_tiny"])
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--runlog", default="runlogs")
    ap.add_argument("--full", action="store_true",
                    help="add GPTQ and composed-recipe (smooth+GPTQ+bias) rows")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.quant import qconfig as QC
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, ObserveCtx, make_sites_fn, quantize_weights
    from dlq_tpu.runlog import RunLogger

    rng = np.random.default_rng(0)

    # build (cfg, flat, qforward, input_shape) per model family
    if args.model == "resnet18":
        from dlq_tpu.models.resnet import ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward

        cfg = ResNetConfig(depth=18, num_classes=100, small_input=True)
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        flat = flatten_folded(fold_resnet(params, cfg))
        qf = qforward
        shape = (32, 32, 3)
    elif args.model == "mlp":
        from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, qforward

        cfg = MLPConfig()
        flat = flatten_params(init_mlp(jax.random.PRNGKey(0), cfg))
        qf = qforward
        shape = (784,)
    elif args.model == "lenet5":
        from dlq_tpu.models.lenet import LeNetConfig, flatten_params, init_lenet, qforward

        cfg = LeNetConfig()
        flat = flatten_params(init_lenet(jax.random.PRNGKey(0), cfg))
        qf = qforward
        shape = (28, 28, 1)
    elif args.model == "mobilenetv2":
        from dlq_tpu.models.mobilenetv2 import (
            MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2, make_qforward,
        )

        cfg = MobileNetV2Config(num_classes=100, small_input=True, width_mult=0.5)
        flat = fold_mobilenetv2(init_mobilenetv2(jax.random.PRNGKey(0), cfg))
        qf = make_qforward(block_meta(cfg))
        shape = (32, 32, 3)
    else:
        from dlq_tpu.models.vit import ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras

        cfg = ViTConfig(image_size=32, patch=4, dim=96, depth=4, heads=3, num_classes=100)
        params = init_vit(jax.random.PRNGKey(0), cfg)
        flat = flatten_vit(params)
        qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
        shape = (32, 32, 3)

    X = rng.normal(0, 1, (args.n,) + shape).astype(np.float32)
    calib = [jnp.asarray(X[: args.batch])]
    fp32_fn = jax.jit(lambda p, xb: qf(ObserveCtx(p), xb, cfg))
    fp32 = np.concatenate([
        np.asarray(fp32_fn(flat, jnp.asarray(X[i : i + args.batch])))
        for i in range(0, args.n, args.batch)
    ])

    logger = RunLogger(root=args.runlog, script="quant_study.py", tag=args.model)
    recipes = []
    for scheme_name in ("INT8_PER_TENSOR", "INT8_PER_CHANNEL", "INT4_WEIGHT_ONLY_G128"):
        for method in (("minmax", "percentile", "mse") if "8" in scheme_name else ("minmax",)):
            recipes.append((scheme_name, method, "rtn"))
    if args.full:
        # the modern-toolbox rows: GPTQ rounding and the composed recipe
        recipes += [("INT4A8_PER_CHANNEL", "minmax", "rtn"),
                    ("INT4A8_PER_CHANNEL", "minmax", "gptq"),
                    ("INT4A8_PER_CHANNEL", "minmax", "ptq_auto"),
                    ("INT8_PER_CHANNEL", "minmax", "ptq_auto")]

    print(f"{'scheme':<22} {'calib':<11} {'round':<9} {'top1':>6} {'top5':>6} "
          f"{'cosine':>9} {'rel_l2':>9}")
    for scheme_name, method, rounding in recipes:
        qcfg = dataclasses.replace(getattr(QC, scheme_name), calibration=method)
        smooth = {}
        if rounding == "ptq_auto":
            from dlq_tpu.quant.recipe import ptq_auto

            qflat, scales, smooth = ptq_auto(qf, flat, cfg, calib, qcfg)
        else:
            scales = None
            if not qcfg.weight_only:
                scales = calibrate(make_sites_fn(qf, cfg), flat, calib, qcfg)
            if rounding == "gptq":
                from dlq_tpu.quant.gptq import collect_hessians, gptq_quantize_weights

                qflat = gptq_quantize_weights(
                    flat, qcfg, collect_hessians(qf, flat, cfg, calib))
            else:
                qflat = quantize_weights(flat, qcfg)
        if smooth:
            from dlq_tpu.quant.smooth import SmoothDeployCtx

            q_fn = jax.jit(lambda p, xb: qf(
                SmoothDeployCtx(p["q"], p["s"], qcfg, smooth), xb, cfg))
        else:
            q_fn = jax.jit(lambda p, xb: qf(DeployCtx(p["q"], p["s"], qcfg), xb, cfg))
        payload = {"q": qflat, "s": scales or {}}
        got = np.concatenate([
            np.asarray(q_fn(payload, jnp.asarray(X[i : i + args.batch])))
            for i in range(0, args.n, args.batch)
        ])
        d = numerics.diff(got, fp32)
        row = {
            "top1_agreement": numerics.top1_agreement(got, fp32),
            "top5_agreement": numerics.topk_agreement(got, fp32, 5),
            "cosine": d.cosine,
            "rel_l2": d.rel_l2,
        }
        logger.log(row, params={"model": args.model, "scheme": scheme_name,
                                "calib": method, "rounding": rounding})
        print(f"{scheme_name:<22} {method:<11} {rounding:<9} "
              f"{row['top1_agreement']:>6.3f} {row['top5_agreement']:>6.3f} "
              f"{row['cosine']:>9.5f} {row['rel_l2']:>9.5f}")
    print(f"[OK] rows logged to {logger.path}; export: RunLogger(root).export_xlsx()")


if __name__ == "__main__":
    main()

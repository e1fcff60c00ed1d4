#!/usr/bin/env python
"""Weak-scaling efficiency CLI (BASELINE: >= 85% 1-chip -> N-chips).

On real multi-chip hardware this measures true ICI scaling; on a single
chip / CPU it runs the same code over a virtual device mesh
(DLQ_CPU_DEVICES=8 DLQ_PLATFORM=cpu) validating the sharding structure.

Usage:
  DLQ_PLATFORM=cpu DLQ_CPU_DEVICES=8 python tools/run_scaling.py \
      [--model resnet18] [--per_device_batch 16] [--model_parallel 2]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="resnet18")
    ap.add_argument("--num_classes", type=int, default=100)
    ap.add_argument("--small_input", action="store_true", default=True)
    ap.add_argument("--per_device_batch", type=int, default=16)
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--int8", action="store_true", help="scale the quantized engine")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from dlq_tpu.bench.scaling import measure_scaling

    if args.model != "resnet18":
        raise SystemExit("scaling CLI currently drives resnet18")
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward, resnet_forward,
    )

    cfg = ResNetConfig(depth=18, num_classes=args.num_classes, small_input=args.small_input)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    size = 32 if cfg.small_input else 224
    if args.int8:
        from dlq_tpu.quant.calibrate import calibrate
        from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
        from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

        flat = flatten_folded(fold_resnet(params, cfg))
        calib = [jnp.asarray(np.random.default_rng(0).normal(0, 1, (8, size, size, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, INT8_PER_CHANNEL)
        qflat = quantize_weights(flat, INT8_PER_CHANNEL)
        payload = {"q": qflat, "s": scales}

        def fwd(p, x):
            return qforward(DeployCtx(p["q"], p["s"], INT8_PER_CHANNEL), x, cfg)

        rep = measure_scaling(fwd, payload, (size, size, 3),
                              per_device_batch=args.per_device_batch,
                              model_parallel=args.model_parallel, iters=args.iters)
    else:
        rep = measure_scaling(lambda p, x: resnet_forward(p, x, cfg), params,
                              (size, size, 3), per_device_batch=args.per_device_batch,
                              model_parallel=args.model_parallel, iters=args.iters)

    print(f"{'devices':>8} {'mp':>3} {'batch':>6} {'ms/batch':>10} {'img/s':>10} {'efficiency':>11}")
    for p in rep["points"]:
        print(f"{p['devices']:>8} {p['model_parallel']:>3} {p['batch']:>6} "
              f"{p['ms_per_batch']:>10.3f} {p['img_per_s']:>10.1f} {p['efficiency']:>10.1%}")
    print(json.dumps(rep["points"][-1]))


if __name__ == "__main__":
    main()

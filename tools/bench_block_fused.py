"""TPU bench: fused Pallas residual-block kernels (PallasBlockCtx) vs the
FullFusedCtx XLA composition, ResNet-18 (b256) and ResNet-50 (b128).

One JSON line per measurement. Single TPU process only.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--models", default="resnet18,resnet50")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.ops.pallas_block import pack_fused_blocks
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, PallasBlockCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    plan = {"resnet18": (18, 256), "resnet50": (50, 128)}
    for name in args.models.split(","):
        depth, batch = plan[name]
        cfg = ResNetConfig(depth=depth, num_classes=1000)
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        flat = flatten_folded(fold_resnet(params, cfg))
        rng = np.random.default_rng(0)
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        qcfg = INT8_PER_CHANNEL
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)
        qflat = quantize_weights(flat, qcfg)
        packs = pack_fused_blocks(qflat, scales, cfg)
        x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

        def ref_fwd(q, s, xb):
            return qforward_fused2(FullFusedCtx(q, s, qcfg), xb, cfg)

        def pal_fwd(q, s, p, xb):
            return qforward_fused2(PallasBlockCtx(q, s, qcfg, p), xb, cfg)

        r_ref = device_time_fn(ref_fwd, qflat, scales, x, perturb_arg=2,
                               n_small=2, n_big=2 + args.iters)
        r_pal = device_time_fn(pal_fwd, qflat, scales, packs, x,
                               perturb_arg=3, n_small=2, n_big=2 + args.iters)
        l_ref = np.asarray(jax.jit(ref_fwd)(qflat, scales, x))
        l_pal = np.asarray(jax.jit(pal_fwd)(qflat, scales, packs, x))
        print(json.dumps({
            "model": name, "batch": batch,
            "fullfused_ms": round(r_ref["ms_median"], 3),
            "pallasblock_ms": round(r_pal["ms_median"], 3),
            "fullfused_img_s": round(batch / r_ref["ms_median"] * 1e3, 1),
            "pallasblock_img_s": round(batch / r_pal["ms_median"] * 1e3, 1),
            "top1_agreement": numerics.top1_agreement(l_pal, l_ref),
            "cosine": round(numerics.diff(l_pal, l_ref).cosine, 6),
            "n_fused_blocks": len(packs),
        }), flush=True)


if __name__ == "__main__":
    sys.exit(main())

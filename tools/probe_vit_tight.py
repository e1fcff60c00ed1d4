"""TPU validation + bench for the ViT fused-block `tight` padding mode
(Np 256->200, Dp 256->192 for DeiT-Ti: ~35% fewer padded FLOPs, relies on
non-128-multiple lane dims compiling). Compares numerics vs the loose
kernel and times both (bf16 and W8A8). One JSON line per measurement.

Importable: run_vit_tight() so one TPU process can run several benches.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def run_vit_tight(batch: int = 256, iters: int = 12):
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks, pack_vit_blocks_w8,
        vit_forward_blockfused, vit_forward_blockfused_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ViTConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)

    results = {}
    for kind in ("bf16", "w8"):
        for tight in (False, True):
            try:
                if kind == "bf16":
                    packed = pack_vit_blocks(params, cfg, tight=tight)

                    def fwd(p, xb, _t=tight):
                        return vit_forward_blockfused(p, xb, cfg, tight=_t)
                else:
                    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg,
                                                tight=tight)

                    def fwd(p, xb, _t=tight):
                        return vit_forward_blockfused_w8(p, xb, cfg, tight=_t)

                logits = np.asarray(jax.jit(fwd)(packed, x))
                r = device_time_fn(fwd, packed, x, perturb_arg=1,
                                   n_small=2, n_big=2 + iters)
                results[(kind, tight)] = (r["ms_median"], logits)
                print(json.dumps({
                    "variant": f"vit_block_{kind}_{'tight' if tight else 'loose'}",
                    "ms": round(r["ms_median"], 3),
                    "img_s": round(batch / r["ms_median"] * 1e3, 1),
                }), flush=True)
            except Exception as e:
                print(json.dumps({
                    "variant": f"vit_block_{kind}_{'tight' if tight else 'loose'}",
                    "error": f"{type(e).__name__}: {str(e)[:140]}",
                }), flush=True)
    for kind in ("bf16", "w8"):
        if (kind, True) in results and (kind, False) in results:
            lt, tt = results[(kind, False)], results[(kind, True)]
            print(json.dumps({
                "variant": f"vit_tight_check_{kind}",
                "speedup": round(lt[0] / tt[0], 3),
                "cosine_vs_loose": round(numerics.diff(tt[1], lt[1]).cosine, 6),
                "top1_agreement": numerics.top1_agreement(tt[1], lt[1]),
            }), flush=True)


if __name__ == "__main__":
    run_vit_tight()

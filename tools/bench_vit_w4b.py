"""TPU sweep 2 for the W4A16 ViT path: stacked multiblock variants.

Per-layer W4 measured 28.7k img/s (bt8, b256). One process: multiblock
L2/L6 x bt4/bt8 at b256, best config re-measured at b384.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(iters: int = 8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.vit import ViTConfig, flatten_vit, init_vit, vit_extras
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4, stack_vit_blocks_w4, vit_forward_multiblock_w4,
    )
    from dlq_tpu.quant.model_quant import quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_PER_OC
    from dlq_tpu.timing import device_time_fn

    _emit(device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    cfg = ViTConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    q4 = quantize_weights(flatten_vit(params), INT4_WEIGHT_ONLY_PER_OC)
    p4 = pack_vit_blocks_w4(q4, vit_extras(params), cfg, tight=True)

    best = (0.0, None)
    x256 = jnp.asarray(rng.normal(0, 1, (256, 224, 224, 3)), jnp.float32)
    for L in (2, 6, 12):
        chunks = stack_vit_blocks_w4(p4, L)
        for bt in (4, 8):
            try:
                def fwd(p, xb, _c=chunks, _bt=bt):
                    q = dict(p)
                    q["_chunks"] = _c
                    return vit_forward_multiblock_w4(q, xb, cfg, bt=_bt,
                                                     tight=True)

                r = device_time_fn(fwd, p4, x256, perturb_arg=1, n_small=2,
                                   n_big=2 + iters)
                ips = 256 / (r["ms_median"] / 1e3)
                _emit(variant=f"w4_multiblock_L{L}_bt{bt}", batch=256,
                      ms=round(r["ms_median"], 3), img_s=round(ips, 1))
                if ips > best[0]:
                    best = (ips, (L, bt))
            except Exception as e:
                _emit(variant=f"w4_multiblock_L{L}_bt{bt}",
                      error=f"{type(e).__name__}: {str(e)[:140]}")

    if best[1]:
        L, bt = best[1]
        chunks = stack_vit_blocks_w4(p4, L)
        x384 = jnp.asarray(rng.normal(0, 1, (384, 224, 224, 3)), jnp.float32)

        def fwd(p, xb):
            q = dict(p)
            q["_chunks"] = chunks
            return vit_forward_multiblock_w4(q, xb, cfg, bt=bt, tight=True)

        r = device_time_fn(fwd, p4, x384, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        _emit(variant=f"w4_multiblock_L{L}_bt{bt}", batch=384,
              ms=round(r["ms_median"], 3),
              img_s=round(384 / (r["ms_median"] / 1e3), 1))


if __name__ == "__main__":
    main()

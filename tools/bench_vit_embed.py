"""TPU sweep round 6: ViT embed-stage rewrites on the full DeiT-Ti W8A8
forward (L6/bt4, tight) — conv-embed (patchify folded into one strided
conv, bit-exact) and raw-uint8 ingest (preprocess folded into the embed,
4x less input bandwidth). Embed stage measured 0.66 ms of 6.98 earlier.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, stack_vit_blocks_w8, vit_forward_multiblock_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ViTConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)
    packed["_chunks"] = stack_vit_blocks_w8(packed, 6)

    def fwd(p, xb, conv_embed=True):
        return vit_forward_multiblock_w8(p, xb, cfg, layers_per_kernel=6,
                                         bt=4, tight=True,
                                         conv_embed=conv_embed)

    for batch in (256, 384):
        xf = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)
        xu = jnp.asarray(rng.integers(0, 256, (batch, 224, 224, 3)),
                         jnp.uint8)
        for name, x, ce in (("dot_embed_f32", xf, False),
                            ("conv_embed_f32", xf, True),
                            ("conv_embed_u8", xu, True)):
            try:
                r = device_time_fn(lambda p, xb, _c=ce: fwd(p, xb, _c),
                                   packed, x, perturb_arg=1, n_small=2,
                                   n_big=2 + iters)
                ms = r["ms_median"]
                _emit(variant=f"{name}_b{batch}", ms=round(ms, 3),
                      img_s=round(batch / ms * 1e3, 1))
            except Exception as e:
                _emit(variant=f"{name}_b{batch}",
                      error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

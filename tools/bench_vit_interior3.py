"""TPU sweep round 3: head-stacked attention (bit-exact restructure — one
batched dot per scores/AV over heads*Bt instead of per-head) against the
measured 1.73 ms of serial small attention dots, plus smaller-L bt8
variants (L6/bt8 lost to VMEM pressure; L3/L4 halve the weight stacks).
One JSON line per measurement.
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
    chunks = {L: stack_vit_blocks_w8(packed, L) for L in (3, 4, 6)}

    def fwd(p, xb, L=6, bt=4, ablate=()):
        p = dict(p)
        p["_chunks"] = chunks[L]
        return vit_forward_multiblock_w8(p, xb, cfg, layers_per_kernel=L,
                                         bt=bt, tight=True, ablate=ablate)

    # (name, L, bt, ablate, batch)
    runs = [("baseline_L6bt4", 6, 4, (), 256),
            ("headstack_L6bt4", 6, 4, ("attn_headstack",), 256),
            ("headstack_L6bt8", 6, 8, ("attn_headstack",), 256),
            ("plain_L4bt8", 4, 8, (), 256),
            ("plain_L3bt8", 3, 8, (), 256),
            ("headstack_L4bt8", 4, 8, ("attn_headstack",), 256),
            ("headstack_L6bt4_b384", 6, 4, ("attn_headstack",), 384),
            ("baseline_L6bt4_b384", 6, 4, (), 384)]
    base_logits = {}
    base_ms = {}
    for name, L, bt, abl, batch in runs:
        try:
            x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)),
                            jnp.float32)
            r = device_time_fn(
                lambda p, xb, _L=L, _b=bt, _a=abl: fwd(p, xb, _L, _b, _a),
                packed, x, perturb_arg=1, n_small=2, n_big=2 + iters)
            ms = r["ms_median"]
            rec = {"variant": name, "ms": round(ms, 3),
                   "img_s": round(batch / ms * 1e3, 1)}
            if name.startswith("baseline"):
                base_ms[batch] = ms
                base_logits[batch] = np.asarray(fwd(packed, x))
            else:
                if batch in base_ms:
                    rec["delta_ms_vs_base"] = round(base_ms[batch] - ms, 3)
                if batch in base_logits:
                    y = np.asarray(fwd(packed, x, L, bt, abl))
                    bl = base_logits[batch]
                    rec["top1_agree_vs_base"] = float(
                        (y.argmax(-1) == bl.argmax(-1)).mean())
            _emit(**rec)
        except Exception as e:
            _emit(variant=name, error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

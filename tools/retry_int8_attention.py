"""Retry the Mosaic-blocked int8 attention on the CURRENT libtpu
(VERDICT r1 #8 / NEXT.md "rejected: Mosaic SIGABRT").

Round 1 found the fused ViT block kernel's dynamically-quantized int8
attention (`ops/pallas_vit_block.py attn_int8=True`: int8 batched 3D dots
+ 3D amax reductions) CPU-correct but SIGABRTing the Mosaic compiler on
TPU. Attention is ~1.73 ms of the 6.17 ms block stack, so a working int8
attention is the largest remaining DeiT lever.

Run as its OWN process (a SIGABRT kills it — the exit code IS the result):
  python tools/retry_int8_attention.py            # compile + measure
Exit 0 with a JSON verdict line, or dies (compiler still broken).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_multiblock_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.models.vit import make_qforward
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    print(json.dumps({"device": str(jax.devices()[0]),
                      "attempt": "attn_int8 fused block kernel"}), flush=True)

    cfg = ViTConfig(num_classes=1000, image_size=224, patch=16, dim=192,
                    depth=12, heads=3)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim,
                       attn_impl="xla")
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)

    batch = 256
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    def fwd(xb, attn_int8):
        # the deploy default: L6-stacked kernels, bt4 (BENCH_NOTES)
        return vit_forward_multiblock_w8(packed, xb, cfg, layers_per_kernel=6,
                                         bt=4, tight=True,
                                         attn_int8=attn_int8)

    # anchor first (bf16 attention), then the retry
    r0 = device_time_fn(lambda xb: fwd(xb, False), x, perturb_arg=0,
                        n_small=2, n_big=8)
    print(json.dumps({"variant": "bf16_attn_anchor",
                      "ms": round(r0["ms_median"], 3),
                      "img_s": round(batch / r0["ms_median"] * 1e3, 0)}),
          flush=True)

    out_ref = np.asarray(jax.jit(lambda xb: fwd(xb, False))(x[:8]))
    # THE RETRY — this line SIGABRTed the round-1 Mosaic
    out_i8 = np.asarray(jax.jit(lambda xb: fwd(xb, True))(x[:8]))
    d = numerics.diff(out_i8, out_ref)
    r1 = device_time_fn(lambda xb: fwd(xb, True), x, perturb_arg=0,
                        n_small=2, n_big=8)
    print(json.dumps({"variant": "int8_attn", "compiled": True,
                      "ms": round(r1["ms_median"], 3),
                      "img_s": round(batch / r1["ms_median"] * 1e3, 0),
                      "cosine_vs_bf16": round(float(d.cosine), 5)}),
          flush=True)


if __name__ == "__main__":
    main()

"""TPU sweep: W4A16 fused ViT block kernel (weight-only int4 DeiT-Ti).

One process: per-layer W4 kernel at b256/b384 with a bt sweep (W4 halves
the per-kernel weight VMEM, so bt=8 may fit/win where the W8 kernel's
didn't), plus the W8A8 multiblock production path as the same-process
anchor. CPU-validated parity in tests/test_vit_blockfused.py.
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
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4_WEIGHT_ONLY_PER_OC, INT8_PER_CHANNEL
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w4, pack_vit_blocks_w8, stack_vit_blocks_w8,
        vit_forward_blockfused_w4, vit_forward_multiblock_w8,
    )
    from dlq_tpu.timing import device_time_fn

    _emit(device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    cfg = ViTConfig()  # deit_tiny
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    ex = vit_extras(params)

    # W4A16 weight-only per-OC
    q4 = quantize_weights(flat, INT4_WEIGHT_ONLY_PER_OC)
    p4 = pack_vit_blocks_w4(q4, ex, cfg, tight=True)
    wb4 = sum(int(np.prod(b[k].shape)) for b in p4["blocks"]
              for k in ("wqkv", "wproj", "wfc1", "wfc2"))
    for b in (256, 384):
        x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
        for bt in (4, 8) if b == 256 else (4,):
            try:
                def fwd(p, xb, _bt=bt):
                    return vit_forward_blockfused_w4(p, xb, cfg, bt=_bt,
                                                     tight=True)

                r = device_time_fn(fwd, p4, x, perturb_arg=1, n_small=2,
                                   n_big=2 + iters)
                _emit(variant=f"w4a16_block_bt{bt}", batch=b,
                      ms=round(r["ms_median"], 3),
                      img_s=round(b / (r["ms_median"] / 1e3), 1),
                      block_weight_mb=round(wb4 / 1e6, 2))
            except Exception as e:
                _emit(variant=f"w4a16_block_bt{bt}", batch=b,
                      error=f"{type(e).__name__}: {str(e)[:140]}")

    # W8A8 multiblock anchor (the production path)
    from dlq_tpu.models.vit import make_qforward

    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    q8 = quantize_weights(flat, INT8_PER_CHANNEL)
    p8 = pack_vit_blocks_w8(q8, scales, ex, cfg, tight=True)
    p8["_chunks"] = stack_vit_blocks_w8(p8, 6)
    wb8 = wb4 * 2
    for b in (256, 384):
        x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)

        def fwd8(p, xb):
            return vit_forward_multiblock_w8(p, xb, cfg, bt=4, tight=True)

        r = device_time_fn(fwd8, p8, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        _emit(variant="w8a8_multiblock_L6_bt4", batch=b,
              ms=round(r["ms_median"], 3),
              img_s=round(b / (r["ms_median"] / 1e3), 1),
              block_weight_mb=round(wb8 / 1e6, 2))


if __name__ == "__main__":
    main()

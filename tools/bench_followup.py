"""Follow-up TPU sweep: int4 kernel tile configs (unpack amortization) and
DeiT fused-block component split (embed vs blocks vs head). One JSON line
per measurement; single TPU process.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def int4_tile_sweep(iters=10):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import int4_matmul
    from dlq_tpu.timing import device_time_fn

    M = K = N = 4096
    group = 128
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scales = jnp.asarray(rng.random((K // group, N)), jnp.float32)
    flops = 2.0 * M * K * N
    for tm, tn, tk in ((256, 512, 1024), (1024, 256, 1024), (2048, 256, 1024),
                       (2048, 256, 512), (2048, 512, 1024), (1024, 512, 1024)):
        try:
            def run(xx, wpp, _t=(tm, tn, tk)):
                return int4_matmul(xx, wpp, scales, None, group=group,
                                   tm=_t[0], tn=_t[1], tk=_t[2])

            r = device_time_fn(run, x, wp, perturb_arg=0, n_small=2,
                               n_big=2 + iters)
            tf = flops / (r["ms_median"] / 1e3) / 1e12
            print(json.dumps({"variant": f"int4_tm{tm}_tn{tn}_tk{tk}",
                              "ms": round(r["ms_median"], 3),
                              "tflops": round(tf, 1),
                              "pct_bf16_peak": round(tf / 197 * 100, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": f"int4_tm{tm}_tn{tn}_tk{tk}",
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)


def vit_component_split(iters=10, batch=256):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, layernorm, make_qforward,
        patchify, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_block_fused_w8, vit_forward_blockfused_w8,
        vit_pads,
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
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)
    N, D = cfg.seq_len, cfg.dim
    hd = D // cfg.heads
    Np, Dp = vit_pads(cfg, tight=True)

    def embed(p, xb):
        B = xb.shape[0]
        y = jnp.dot(patchify(xb.astype(jnp.bfloat16), cfg.patch), p["patch"]["w"],
                    preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        y = y + p["patch"]["b"]
        cls = jnp.broadcast_to(p["cls"], (B, 1, D)).astype(jnp.bfloat16)
        y = jnp.concatenate([cls, y], axis=1) + p["pos"]
        return jnp.pad(y, ((0, 0), (0, Np - N), (0, Dp - D)))

    r = device_time_fn(embed, packed, x, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    print(json.dumps({"variant": "vit_embed(patchify+proj+pos+pad)",
                      "ms": round(r["ms_median"], 3)}), flush=True)

    y0 = jax.jit(embed)(packed, x)

    def blocks_only(p, yb):
        y = yb
        for w in p["blocks"]:
            y = vit_block_fused_w8(y, w, n_valid=N, d_valid=D, heads=cfg.heads,
                                   hd=hd, bt=8, gelu_tanh=True)
        return y

    r = device_time_fn(blocks_only, packed, y0, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    print(json.dumps({"variant": "vit_blocks_only(12 fused kernels)",
                      "ms": round(r["ms_median"], 3)}), flush=True)

    def head(p, yb):
        hf = layernorm(yb[:, 0, :D].astype(jnp.float32), p["norm"])
        return jnp.dot(hf, p["head"]["w"],
                       preferred_element_type=jnp.float32) + p["head"]["b"]

    r = device_time_fn(head, packed, y0, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    print(json.dumps({"variant": "vit_head(ln+fc)",
                      "ms": round(r["ms_median"], 3)}), flush=True)

    def full(p, xb):
        return vit_forward_blockfused_w8(p, xb, cfg, tight=True)

    r = device_time_fn(full, packed, x, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    print(json.dumps({"variant": "vit_full_w8_tight",
                      "ms": round(r["ms_median"], 3)}), flush=True)


if __name__ == "__main__":
    int4_tile_sweep()
    vit_component_split()

"""ViT/DeiT-Ti performance breakdown on TPU (NEXT.md perf item #1).

Times the full forward under dtype x attention-impl variants, plus isolated
component stacks (attention-only, LN-only, MLP-only) to locate the
bottleneck. One JSON line per measurement.

Usage: python tools/bench_vit_breakdown.py [--batch 256] [--variants all]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument("--variants", default="all",
                    help="comma list: fp32_xla,bf16_xla,bf16_fused,fp32_fused,"
                         "bf16_fast,int8_fast,attn_xla,attn_fused,ln_only,"
                         "ln_fused,mlp_only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import jax.tree_util as jtu

    from dlq_tpu.models.vit import (
        ViTConfig, attention, init_vit, layernorm, vit_forward,
    )
    from dlq_tpu.ops.pallas_attention import attention_fused
    from dlq_tpu.timing import device_time_fn

    want = set(args.variants.split(",")) if args.variants != "all" else None

    def sel(name):
        return want is None or name in want

    B = args.batch
    cfg = ViTConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    params_bf16 = jtu.tree_map(lambda a: a.astype(jnp.bfloat16), params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (B, 224, 224, 3)), jnp.float32)
    xb = x.astype(jnp.bfloat16)

    def emit(name, r, note=""):
        print(json.dumps({
            "variant": name, "ms": round(r["ms_median"], 3),
            "img_per_s": round(B / (r["ms_median"] / 1e3), 1),
            "batch": B, "note": note,
        }), flush=True)

    t0 = time.time()
    fwd_cache = {}

    def full(name, p, xx, impl, fused_ln=False, gelu="exact"):
        c = ViTConfig(attn_impl=impl, fused_ln=fused_ln, gelu=gelu)

        def f(pp, xi):
            return vit_forward(pp, xi, c)

        r = device_time_fn(f, p, xx, perturb_arg=1, n_small=2, n_big=2 + args.iters)
        emit(name, r)
        fwd_cache[name] = r

    if sel("fp32_xla"):
        full("fp32_xla", params, x, "xla")
    if sel("bf16_xla"):
        full("bf16_xla", params_bf16, xb, "xla")
    if sel("bf16_fused"):
        full("bf16_fused", params_bf16, xb, "fused")
    if sel("fp32_fused"):
        full("fp32_fused", params, x, "fused")
    if sel("bf16_fast"):
        full("bf16_fast", params_bf16, xb, "fused", fused_ln=True)
    if sel("bf16_lnfast"):
        full("bf16_lnfast", params_bf16, xb, "xla", fused_ln=True)
    if sel("fp32_fast"):
        full("fp32_fast", params, x, "fused", fused_ln=True)
    if sel("bf16_deploy"):
        # the production recipe: bf16 + fused attention + tanh gelu
        full("bf16_deploy", params_bf16, xb, "fused", gelu="tanh")
    if sel("int8_block"):
        # W8A8 fused whole-block kernel — quantized ViT that actually pays
        from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
        from dlq_tpu.ops.pallas_vit_block import (
            pack_vit_blocks_w8, vit_forward_blockfused_w8,
        )
        from dlq_tpu.quant.calibrate import calibrate
        from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
        from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

        flat = flatten_vit(params)
        qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
        packedq = pack_vit_blocks_w8(quantize_weights(flat, INT8_PER_CHANNEL),
                                     scales, vit_extras(params), cfg)
        for bt in (4, 8):
            def fq(pp, xi, _bt=bt):
                return vit_forward_blockfused_w8(pp, xi, cfg, bt=_bt)

            r = device_time_fn(fq, packedq, x, perturb_arg=1,
                               n_small=2, n_big=2 + args.iters)
            emit(f"int8_block_bt{bt}", r, "W8A8 fused whole-block kernel")

    if sel("bf16_block"):
        # fused whole-block kernel (ops/pallas_vit_block.py)
        from dlq_tpu.ops.pallas_vit_block import pack_vit_blocks, vit_forward_blockfused

        packed = pack_vit_blocks(params, cfg)
        for bt in (2, 4, 8):
            def fblk(pp, xi, _bt=bt):
                return vit_forward_blockfused(pp, xi, cfg, bt=_bt, gelu_tanh=True)

            r = device_time_fn(fblk, packed, x, perturb_arg=1,
                               n_small=2, n_big=2 + args.iters)
            emit(f"bf16_block_bt{bt}", r, "fused whole-block kernel")
    if sel("int8_fast"):
        # quantized deploy with the fused Pallas kernels (bf16 interchange)
        from dlq_tpu.models.vit import flatten_vit, make_qforward, vit_extras
        from dlq_tpu.quant.calibrate import calibrate
        from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
        from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

        flat = flatten_vit(params)
        qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch,
                           cfg.dim, attn_impl="fused", fused_ln=True)
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
        qflat = quantize_weights(flat, INT8_PER_CHANNEL)

        def f8(pp, xi):
            return qf(DeployCtx(pp, scales, INT8_PER_CHANNEL), xi, cfg)

        r = device_time_fn(f8, qflat, x, perturb_arg=1, n_small=2, n_big=2 + args.iters)
        emit("int8_fast", r, "W8A8 deploy + fused attention/LN")

    # ---- isolated component stacks (bf16, 12x like the real depth) ----
    N, D, h = cfg.seq_len, cfg.dim, cfg.heads
    y0 = jnp.asarray(rng.normal(0, 1, (B, N, D)), jnp.bfloat16)
    lp = params_bf16["layers"][0]

    if sel("attn_xla"):
        def attn_stack_xla(w, y):
            for _ in range(cfg.depth):
                q = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(y.dtype)
                y = attention(q, y, y, h, impl="xla")
            return y
        r = device_time_fn(attn_stack_xla, lp["proj"]["w"], y0, perturb_arg=1,
                           n_small=2, n_big=2 + args.iters)
        emit("attn_xla_x12", r, "12x (1 dense + xla attention)")

    if sel("attn_fused"):
        def attn_stack_fused(w, y):
            for _ in range(cfg.depth):
                q = jnp.dot(y, w, preferred_element_type=jnp.float32).astype(y.dtype)
                y = attention_fused(q, y, y, h)
            return y
        r = device_time_fn(attn_stack_fused, lp["proj"]["w"], y0, perturb_arg=1,
                           n_small=2, n_big=2 + args.iters)
        emit("attn_fused_x12", r, "12x (1 dense + fused attention)")

    if sel("ln_only"):
        def ln_stack(g, y):
            for _ in range(2 * cfg.depth):
                y = layernorm(y, {"g": g, "b": lp["ln1"]["b"]})
            return y
        r = device_time_fn(ln_stack, lp["ln1"]["g"], y0, perturb_arg=1,
                           n_small=2, n_big=2 + args.iters)
        emit("ln_x24", r, "24 layernorms")

    if sel("ln_fused"):
        from dlq_tpu.ops.pallas_layernorm import layernorm_fused

        def lnf_stack(g, y):
            for _ in range(2 * cfg.depth):
                y = layernorm_fused(y, g, lp["ln1"]["b"])
            return y
        r = device_time_fn(lnf_stack, lp["ln1"]["g"], y0, perturb_arg=1,
                           n_small=2, n_big=2 + args.iters)
        emit("ln_fused_x24", r, "24 fused layernorms")

    if sel("mlp_only"):
        def mlp_stack(w1, y):
            for _ in range(cfg.depth):
                hdn = jnp.dot(y, w1, preferred_element_type=jnp.float32).astype(y.dtype)
                hdn = jax.nn.gelu(hdn, approximate=False)
                y = y + jnp.dot(hdn, lp["fc2"]["w"], preferred_element_type=jnp.float32).astype(y.dtype)
            return y
        r = device_time_fn(mlp_stack, lp["fc1"]["w"], y0, perturb_arg=1,
                           n_small=2, n_big=2 + args.iters)
        emit("mlp_x12", r, "12x fc1+gelu+fc2+res")

    if sel("mlp_acts"):
        # isolate the nonlinearity cost: same 12x MLP with different acts
        for act_name, act in [
            ("nogelu", lambda t: t),
            ("relu", lambda t: jnp.maximum(t, 0)),
            ("gelu_tanh", lambda t: jax.nn.gelu(t, approximate=True)),
        ]:
            def mlp_stack_a(w1, y, _act=act):
                for _ in range(cfg.depth):
                    hdn = jnp.dot(y, w1, preferred_element_type=jnp.float32).astype(y.dtype)
                    hdn = _act(hdn)
                    y = y + jnp.dot(hdn, lp["fc2"]["w"], preferred_element_type=jnp.float32).astype(y.dtype)
                return y
            r = device_time_fn(mlp_stack_a, lp["fc1"]["w"], y0, perturb_arg=1,
                               n_small=2, n_big=2 + args.iters)
            emit(f"mlp_x12_{act_name}", r, f"12x fc1+{act_name}+fc2+res")

    print(json.dumps({"variant": "_done", "wall_s": round(time.time() - t0, 1),
                      "device": str(jax.devices()[0])}), flush=True)


if __name__ == "__main__":
    main()

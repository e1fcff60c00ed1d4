"""TPU sweep round 2: interior optimization candidates chosen from the
round-1 breakdown (tools/bench_vit_interior.py — attn dots 1.73 ms,
softmax 0.55, LN 0.58, GELU 0.54 of the 6.17 ms baseline; bt8 slower;
max-reduce/div NOT the softmax cost).

Candidates: ln_mxu (moments as MXU dots), gelu_bf16 (tanh chain on bf16
vregs), sm_bf16 (softmax chain on bf16 vregs) — each alone, then combined,
then the winning combo at the b384 headline batch. Accuracy vs exact
baseline on-device. Also pins the int4 fused/xla2 crossover at M=512.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def vit_round2(iters=8):
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

    def fwd(p, xb, ablate=()):
        return vit_forward_multiblock_w8(p, xb, cfg, layers_per_kernel=6,
                                         bt=4, tight=True, ablate=ablate)

    runs = [("baseline", ()),
            ("opt_ln_mxu", ("ln_mxu",)),
            ("opt_gelu_bf16", ("gelu_bf16",)),
            ("opt_sm_bf16", ("sm_bf16",)),
            ("opt_combo3", ("ln_mxu", "gelu_bf16", "sm_bf16"))]
    base_ms = {}
    base_logits = {}
    for batch in (256, 384):
        x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)
        for name, abl in runs:
            try:
                r = device_time_fn(lambda p, xb, _a=abl: fwd(p, xb, _a),
                                   packed, x, perturb_arg=1, n_small=2,
                                   n_big=2 + iters)
                ms = r["ms_median"]
                rec = {"variant": f"{name}_b{batch}", "ms": round(ms, 3),
                       "img_s": round(batch / ms * 1e3, 1)}
                if name == "baseline":
                    base_ms[batch] = ms
                    base_logits[batch] = np.asarray(fwd(packed, x))
                else:
                    rec["delta_ms_vs_base"] = round(base_ms[batch] - ms, 3)
                    y = np.asarray(fwd(packed, x, abl))
                    bl = base_logits[batch]
                    rec["top1_agree_vs_base"] = float(
                        (y.argmax(-1) == bl.argmax(-1)).mean())
                    rec["cosine_vs_base"] = round(float(
                        (y * bl).sum() / (np.linalg.norm(y)
                                          * np.linalg.norm(bl) + 1e-30)), 6)
                _emit(**rec)
            except Exception as e:
                _emit(variant=f"{name}_b{batch}",
                      error=f"{type(e).__name__}: {str(e)[:160]}")


def int4_crossover(iters=6):
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import int4_matmul, int4_matmul_xla2
    from dlq_tpu.quant.quantize import pack_int4
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    K = N = 4096
    g = 128
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    scales = jnp.asarray((rng.random((K // g, N)) * 0.05 + 0.01), jnp.float32)
    for M in (512,):
        x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
        for name, fn in (
            ("int4_fused", lambda xb: int4_matmul(xb, packed, scales, None,
                                                  group=g)),
            ("int4_xla2", lambda xb: int4_matmul_xla2(xb, packed, scales,
                                                      None, group=g)),
        ):
            try:
                r = device_time_fn(fn, x, perturb_arg=0, n_small=2,
                                   n_big=2 + iters)
                ms = r["ms_median"]
                tf = 2 * M * N * K / (ms * 1e-3) / 1e12
                _emit(variant=f"{name}_M{M}", ms=round(ms, 4),
                      tflops=round(tf, 1))
            except Exception as e:
                _emit(variant=f"{name}_M{M}",
                      error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    vit_round2()
    int4_crossover()

"""TPU sweep: DeiT-Ti W8A8 multiblock-kernel interior breakdown + softmax
optimizations + int4 two-pass matmul variants. One process, one warmup
(NEXT.md rule: batch ALL TPU measurements).

Interior method: each ablation token replaces one in-kernel phase with a
shape-preserving stub; (baseline - ablated) ms is that phase's marginal
cost. sm_recip / sm_nomax are real optimization candidates — their accuracy
vs the exact-softmax baseline is checked on-device (top-1 agreement,
cosine). One JSON line per measurement.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

BATCH = 256


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def vit_interior(iters=8):
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
    x = jnp.asarray(rng.normal(0, 1, (BATCH, 224, 224, 3)), jnp.float32)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)
    packed["_chunks"] = stack_vit_blocks_w8(packed, 6)

    def fwd(p, xb, bt=4, ablate=()):
        return vit_forward_multiblock_w8(p, xb, cfg, layers_per_kernel=6,
                                         bt=bt, tight=True, ablate=ablate)

    base_logits = None
    base_ms = None
    runs = [("baseline", 4, ()),
            ("abl_ln", 4, ("ln",)),
            ("abl_gelu", 4, ("gelu",)),
            ("abl_quant", 4, ("quant",)),
            ("abl_softmax", 4, ("softmax",)),
            ("abl_attn", 4, ("attn",)),
            ("abl_epilogue", 4, ("epilogue",)),
            ("opt_sm_recip", 4, ("sm_recip",)),
            ("opt_sm_nomax", 4, ("sm_nomax",)),
            ("baseline_bt8", 8, ()),
            ("baseline_bt16", 16, ()),
            ("opt_sm_nomax_bt8", 8, ("sm_nomax",))]
    for name, bt, abl in runs:
        try:
            r = device_time_fn(lambda p, xb, _b=bt, _a=abl: fwd(p, xb, _b, _a),
                               packed, x, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            ms = r["ms_median"]
            rec = {"variant": name, "ms": round(ms, 3),
                   "img_s": round(BATCH / ms * 1e3, 1)}
            if name == "baseline":
                base_ms = ms
                base_logits = np.asarray(fwd(packed, x))
            elif base_ms is not None:
                rec["delta_ms_vs_base"] = round(base_ms - ms, 3)
            if name.startswith("opt_") and base_logits is not None:
                y = np.asarray(fwd(packed, x, bt, abl))
                agree = float((y.argmax(-1) == base_logits.argmax(-1)).mean())
                cos = float((y * base_logits).sum()
                            / (np.linalg.norm(y) * np.linalg.norm(base_logits)
                               + 1e-30))
                rec["top1_agree_vs_base"] = agree
                rec["cosine_vs_base"] = round(cos, 6)
            _emit(**rec)
        except Exception as e:
            _emit(variant=name, error=f"{type(e).__name__}: {str(e)[:160]}")


def int4_variants(iters=6):
    """Fused in-register-unpack kernel vs two-pass XLA dequant, over M
    (crossover for int4_matmul_auto's m_threshold)."""
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import (
        int4_matmul, int4_matmul_xla2,
    )
    from dlq_tpu.quant.quantize import pack_int4
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    K = N = 4096
    g = 128
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    scales = jnp.asarray((rng.random((K // g, N)) * 0.05 + 0.01), jnp.float32)
    for M in (256, 1024, 4096):
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
                      tflops=round(tf, 1), pct_bf16_peak=round(tf / 197 * 100, 1))
            except Exception as e:
                _emit(variant=f"{name}_M{M}",
                      error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    vit_interior()
    int4_variants()

"""ResNet-18 stem component breakdown on TPU (NEXT.md perf item #2).

The FullFusedCtx bf16-stem path costs ~1.7 ms of the 5.41 ms b256 forward
(BENCH_NOTES.md stage table). This tool times each stem ingredient in
isolation to locate where a fused Pallas stem kernel can win, plus the
candidate XLA-side prep (quantize+space-to-depth relayout) such a kernel
would be fed with. One JSON line per measurement.

Usage: python tools/bench_stem_breakdown.py [--batch 256]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.common import conv2d, maxpool2d
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.model_quant import FullFusedCtx, ObserveCtx
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.quant.quantize import quantize_act
    from dlq_tpu.timing import device_time_fn

    B = args.batch
    it = args.iters
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    eng = Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                           calib_batches=calib, batch=B, name="stem_breakdown")
    qflat, scales = eng.params["qflat"], eng.params["scales"]
    qcfg = INT8_PER_CHANNEL

    x = jnp.asarray(rng.normal(0, 1, (B, 224, 224, 3)), jnp.float32)

    def ctx():
        return FullFusedCtx(qflat, scales, qcfg)

    def t(name, fn, *a, perturb_arg=0):
        r = device_time_fn(fn, *a, perturb_arg=perturb_arg, n_small=2,
                           n_big=2 + it)
        print(json.dumps({"metric": name, "ms": round(r["ms_median"], 4),
                          "batch": B}), flush=True)
        return r["ms_median"]

    # ---- reference points --------------------------------------------------
    def full_fwd(xb):
        return qforward_fused2(ctx(), xb, cfg)

    t("full_fused2_bf16stem", full_fwd, x)

    # ---- stem ingredients --------------------------------------------------
    s_in = scales["stem"]

    def quantize_only(xb):
        return quantize_act(xb, s_in, qcfg.acts.qmax)

    t("quantize_input", quantize_only, x)

    def cast_only(xb):
        return xb.astype(jnp.bfloat16)

    t("cast_bf16", cast_only, x)

    def stem_bf16(xb):
        return ctx().conv_stem_bf16("stem", xb, out_site="layer1.0.conv1").q

    t("stem_bf16_full(cast+conv+requant)", stem_bf16, x)

    # bf16 conv alone from a pre-cast input (no requant epilogue)
    wq = qflat["stem"]["qw"]
    w_deq = (wq.values.reshape(wq.layout_shape).astype(jnp.float32)
             * wq.scale).astype(jnp.bfloat16)
    xbf = x.astype(jnp.bfloat16)

    def conv_bf16_only(xb):
        return conv2d(xb, w_deq, stride=2, padding=3, preferred=jnp.float32)

    t("conv_bf16_only", conv_bf16_only, xbf)

    def stem_int8(xb):
        return ctx().conv("stem", xb, stride=2, padding=3, fuse_relu=True,
                          out_site="layer1.0.conv1").q

    t("stem_int8_full(quant+conv+requant)", stem_int8, x)

    def stem_s2d(xb):
        return ctx().conv_stem_s2d("stem", xb, out_site="layer1.0.conv1").q

    t("stem_s2d_full", stem_s2d, x)

    # int8 maxpool on the conv output
    y8 = jax.jit(stem_bf16)(x)

    def pool_int8(yb):
        return maxpool2d(yb, 3, 2, 1)

    t("maxpool_int8", pool_int8, y8)

    # the whole stem block as deployed today
    def stem_plus_pool(xb):
        q = ctx().conv_stem_bf16("stem", xb, out_site="layer1.0.conv1")
        return maxpool2d(q.q, 3, 2, 1)

    t("stem_bf16_plus_pool", stem_plus_pool, x)

    # ---- candidate Pallas feed: quantize + s2d relayout, group-pad to 16 ---
    def prep_s2d16(xb):
        n, h, w, c = xb.shape
        q = quantize_act(xb, s_in, qcfg.acts.qmax)
        qp = jnp.pad(q, ((0, 0), (4, 2), (4, 2), (0, 13)))  # 3 -> 16 ch
        h2, w2 = (h + 6) // 2, (w + 6) // 2
        s2 = qp.reshape(n, h2, 2, w2, 2, 16).transpose(0, 1, 3, 2, 4, 5)
        # [n, 115, 115, 2, 2, 16] -> want groups of (2x2x3->16): that padded
        # 16 above double-pads; do the honest version: pad AFTER grouping.
        return s2.reshape(n, h2, w2 * 4 * 16)

    t("prep_quant_s2d_pad16(approx)", prep_s2d16, x)

    # honest layout: group = 2x2x3 = 12 -> pad to 16 lanes per group
    def prep_s2d16b(xb):
        n, h, w, c = xb.shape
        q = quantize_act(xb, s_in, qcfg.acts.qmax)
        qp = jnp.pad(q, ((0, 0), (4, 2), (4, 2), (0, 0)))
        h2, w2 = (h + 6) // 2, (w + 6) // 2
        s2 = qp.reshape(n, h2, 2, w2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
        s2 = s2.reshape(n, h2, w2, 12)
        s2 = jnp.pad(s2, ((0, 0), (0, 0), (0, 0), (0, 4)))
        return s2.reshape(n, h2, w2 * 16)

    t("prep_quant_s2d_pad16(honest)", prep_s2d16b, x)


if __name__ == "__main__":
    sys.exit(main())

"""Consolidated TPU sweep (one process, one warmup): ViT block-kernel bt
sweep, ResNet-50/34 FullFusedCtx batch sweep, MobileNetV2 width-1.4, and a
jax.profiler trace-capture smoke test through the relay. One JSON line per
measurement.
"""

from __future__ import annotations

import glob
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def vit_bt_sweep(iters=10):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )
    from dlq_tpu.ops.pallas_vit_block import (
        pack_vit_blocks_w8, vit_forward_blockfused_w8,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ViTConfig()
    params = init_vit(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (256, 224, 224, 3)), jnp.float32)
    flat = flatten_vit(params)
    ex = vit_extras(params)
    qf = make_qforward(ex, cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    packed = pack_vit_blocks_w8(qflat, scales, ex, cfg, tight=True)
    for bt in (4, 8, 16, 32):
        try:
            def fwd(p, xb, _bt=bt):
                return vit_forward_blockfused_w8(p, xb, cfg, bt=_bt, tight=True)

            r = device_time_fn(fwd, packed, x, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            print(json.dumps({"variant": f"vit_w8_tight_bt{bt}",
                              "ms": round(r["ms_median"], 3),
                              "img_s": round(256 / r["ms_median"] * 1e3, 1)}),
                  flush=True)
        except Exception as e:
            print(json.dumps({"variant": f"vit_w8_tight_bt{bt}",
                              "error": f"{type(e).__name__}: {str(e)[:120]}"}),
                  flush=True)


def resnet_batch_sweep(iters=10):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    for depth, batches in ((50, (64, 128, 256)), (34, (256,))):
        cfg = ResNetConfig(depth=depth, num_classes=1000)
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        flat = flatten_folded(fold_resnet(params, cfg))
        rng = np.random.default_rng(0)
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                           INT8_PER_CHANNEL)
        qflat = quantize_weights(flat, INT8_PER_CHANNEL)

        def fwd(q, s, xb):
            return qforward_fused2(FullFusedCtx(q, s, INT8_PER_CHANNEL), xb, cfg)

        for b in batches:
            x = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
            r = device_time_fn(fwd, qflat, scales, x, perturb_arg=2,
                               n_small=2, n_big=2 + iters)
            print(json.dumps({"variant": f"resnet{depth}_fused2_b{b}",
                              "ms": round(r["ms_median"], 3),
                              "img_s": round(b / r["ms_median"] * 1e3, 1)}),
                  flush=True)


def mnv2_width14(iters=10):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        DeployCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = MobileNetV2Config(num_classes=1000, width_mult=1.4)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    x = jnp.asarray(rng.normal(0, 1, (256, 224, 224, 3)), jnp.float32)

    def fwd(q, s, xb):
        return qf(DeployCtx(q, s, INT8_PER_CHANNEL), xb, cfg)

    r = device_time_fn(fwd, qflat, scales, x, perturb_arg=2, n_small=2,
                       n_big=2 + iters)
    print(json.dumps({"variant": "mnv2_w1.4_deploy_b256",
                      "ms": round(r["ms_median"], 3),
                      "img_s": round(256 / r["ms_median"] * 1e3, 1)}),
          flush=True)


def profiler_trace_smoke():
    """NEXT.md: jax.profiler trace through the relay was untested."""
    import jax
    import jax.numpy as jnp

    from dlq_tpu.bench.profile import trace_capture

    a = jnp.ones((1024, 1024), jnp.bfloat16)
    f = jax.jit(lambda x: x @ x)
    _ = f(a).block_until_ready()
    with tempfile.TemporaryDirectory() as d:
        try:
            with trace_capture(d):
                _ = f(a).block_until_ready()
            files = glob.glob(os.path.join(d, "**", "*"), recursive=True)
            n = len([p for p in files if os.path.isfile(p)])
            print(json.dumps({"variant": "profiler_trace", "files": n,
                              "ok": n > 0}), flush=True)
        except Exception as e:
            print(json.dumps({"variant": "profiler_trace",
                              "error": f"{type(e).__name__}: {str(e)[:140]}"}),
                  flush=True)


if __name__ == "__main__":
    profiler_trace_smoke()
    vit_bt_sweep()
    resnet_batch_sweep()
    mnv2_width14()

"""TPU sweep: W4A8 conv models + int4 kernel VMEM-boundary bisect.

One process (relay rule: batch ALL TPU measurements):
  1. ResNet-18 b384 — W8A8 FullFusedCtx anchor vs W4A8 (INT4A8_PER_CHANNEL)
     FullFusedCtx: int4 conv weights unpacked in-graph onto the int8 conv
     rate at half the weight residency.
  2. ResNet-50 b128 — same pair (bottleneck 1x1-heavy: more weight-bound).
  3. int4 matmul tile bisect at 4096^3 — retry the VMEM-failing corners
     (W4A16 tm=2048, W4A8 tm=1024 / tn=2048) with reduced co-tiles.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def bench_model(depth: int, batch: int, iters: int = 8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import FullFusedCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ResNetConfig(depth=depth, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    outs = {}
    for name, qcfg in (("w8a8", INT8_PER_CHANNEL), ("w4a8", INT4A8_PER_CHANNEL)):
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)
        qflat = quantize_weights(flat, qcfg)
        wbytes = sum(p["qw"].nbytes for p in qflat.values())

        def fwd(p, xb, _q=qcfg):
            return qforward_fused2(FullFusedCtx(p["qflat"], p["scales"], _q), xb, cfg)

        payload = {"qflat": qflat, "scales": scales}
        r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ips = batch / (r["ms_median"] / 1e3)
        outs[name] = (payload, fwd, r["ms_median"], ips, wbytes)
        _emit(model=f"resnet{depth}", variant=name, batch=batch,
              ms=round(r["ms_median"], 3), img_s=round(ips, 1),
              weight_mb=round(wbytes / 1e6, 2))

    import jax as _j

    l8 = np.asarray(_j.jit(outs["w8a8"][1])(outs["w8a8"][0], x[:64]))
    l4 = np.asarray(_j.jit(outs["w4a8"][1])(outs["w4a8"][0], x[:64]))
    _emit(model=f"resnet{depth}", compare="w4a8_vs_w8a8",
          cosine=round(float(numerics.diff(l4, l8).cosine), 5),
          top1=float(numerics.top1_agreement(l4, l8)))


def bench_int4_tiles(iters: int = 6):
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import int4_matmul, int4a8_matmul
    from dlq_tpu.quant.quantize import pack_int4
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    M = K = N = 4096
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    scale = jnp.asarray(rng.random(N) * 0.01 + 0.001, jnp.float32)
    gs = jnp.asarray((rng.random((K // 128, N)) * 0.01 + 0.001), jnp.float32)
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    xf = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)

    # W4A8 bisect: tm=1024 corners with smaller co-tiles; tn=2048 with small tm
    for tm, tn, tk in ((1024, 512, 1024), (1024, 512, 2048), (1024, 1024, 512),
                       (1024, 512, 512), (256, 2048, 1024), (512, 1024, 4096)):
        try:
            r = device_time_fn(
                lambda xb, _m=tm, _n=tn, _k=tk: int4a8_matmul(
                    xb, packed, scale, None, tm=_m, tn=_n, tk=_k),
                x8, perturb_arg=0, n_small=2, n_big=2 + iters)
            tops = 2 * M * N * K / (r["ms_median"] * 1e-3) / 1e12
            _emit(variant=f"int4a8_tm{tm}_tn{tn}_tk{tk}",
                  ms=round(r["ms_median"], 4), tops=round(tops, 1),
                  pct_int8_peak=round(tops / 394 * 100, 1))
        except Exception as e:
            _emit(variant=f"int4a8_tm{tm}_tn{tn}_tk{tk}",
                  error=f"{type(e).__name__}: {str(e)[:140]}")

    # W4A16 bisect: tm=2048 with reduced tn/tk
    for tm, tn, tk in ((2048, 256, 1024), (2048, 512, 512), (2048, 256, 2048),
                       (1024, 256, 2048), (1024, 512, 2048)):
        try:
            r = device_time_fn(
                lambda xb, _m=tm, _n=tn, _k=tk: int4_matmul(
                    xb, packed, gs, None, group=128, tm=_m, tn=_n, tk=_k),
                xf, perturb_arg=0, n_small=2, n_big=2 + iters)
            tf = 2 * M * N * K / (r["ms_median"] * 1e-3) / 1e12
            _emit(variant=f"int4_tm{tm}_tn{tn}_tk{tk}",
                  ms=round(r["ms_median"], 4), tflops=round(tf, 1),
                  pct_bf16_peak=round(tf / 197 * 100, 1))
        except Exception as e:
            _emit(variant=f"int4_tm{tm}_tn{tn}_tk{tk}",
                  error=f"{type(e).__name__}: {str(e)[:140]}")


def main():
    import jax

    _emit(device=str(jax.devices()[0]))
    if "deep" in sys.argv[1:]:
        # round-6 completion of the W4 throughput matrix: the remaining
        # bottleneck depths (50/101/152 now run mm1x1-defaulted W8A8 vs
        # in-graph-unpack W4A8 at half the weight bytes)
        for depth in (50, 101, 152):
            bench_model(depth, 128)
        return
    bench_model(18, 384)
    bench_model(50, 128)
    bench_int4_tiles()


if __name__ == "__main__":
    main()

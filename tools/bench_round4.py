#!/usr/bin/env python
"""Round-4 TPU campaign (one process, phases selectable):

  info     backend/version banner (decides whether the round-3 negative
           verdicts — Mosaic int8-attention SIGABRT, requant miscompiles —
           are worth re-testing on this libtpu).
  serving  InferenceServer (dlq_tpu/serving.py) measured on the real chip:
           closed-loop sustained throughput + batch fill + per-request
           latency through the continuous batcher, against the raw engine
           device rate (chained-slope) — the serving-layer efficiency row
           NEXT.md flagged as missing. Reference analogue: the per-image
           process-spawn loop of `tools/bench_fp32_vs_torch_e2e.py:90-132`
           is exactly the deployment anti-pattern this layer replaces.
  deep     ResNet-50/101/152 FullFusedCtx batch sweep (last tuned round 1,
           ResNet-101/152 never measured): int8 fused2 vs fp32 anchor,
           top-1 agreement + cosine gates, model MFU via cost_analysis.

Usage:  python tools/bench_round4.py [info serving deep]
Writes one JSON line per measurement to stdout AND runlogs/r4/round4.jsonl
(runlogs jsonl are git-tracked as of round 4 — round-3's logs lived in a
gitignored dir and were lost to a workspace reset).
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

_LOG = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "runlogs", "r4", "round4.jsonl")


def _emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    os.makedirs(os.path.dirname(_LOG), exist_ok=True)
    with open(_LOG, "a") as f:
        f.write(line + "\n")


def phase_info():
    import jax

    import jaxlib

    ver = {"jax": jax.__version__, "jaxlib": jaxlib.__version__}
    try:
        import libtpu

        ver["libtpu"] = getattr(libtpu, "__version__", "?")
    except Exception:
        try:
            import importlib.metadata as md

            for d in ("libtpu", "libtpu-nightly"):
                try:
                    ver["libtpu"] = md.version(d)
                    break
                except md.PackageNotFoundError:
                    pass
        except Exception:
            pass
    _emit(phase="info", device=str(jax.devices()[0]),
          n_devices=len(jax.devices()),
          compile_cache=getattr(jax.config, "jax_compilation_cache_dir", "")
          or "", **ver)


def _build_int8_resnet18(batch, size=224, small_input=False):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg = ResNetConfig(depth=18, num_classes=1000, small_input=small_input)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, size, size, 3)), jnp.float32)]
    eng = Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                           calib_batches=calib, batch=batch,
                           name="resnet18_int8_serving")
    return eng


_SMOKE = os.environ.get("DLQ_R4_SMOKE") == "1"  # tiny CPU validation run


def phase_serving(batch=128, clients=512, seconds=12.0, iters=10,
                  size=224, small=False):
    if _SMOKE:
        batch, clients, seconds, iters = 8, 16, 2.0, 2
    import jax as _j

    dev = _j.devices()[0].platform
    """Closed-loop serving benchmark on the int8 ResNet-18 engine."""
    import jax.numpy as jnp

    from dlq_tpu.serving import InferenceServer
    from dlq_tpu.timing import device_time_fn

    eng = _build_int8_resnet18(batch, size=size, small_input=small)
    rng = np.random.default_rng(1)
    x1 = rng.normal(0, 1, (size, size, 3)).astype(np.float32)
    xb = rng.normal(0, 1, (batch, size, size, 3)).astype(np.float32)

    # raw engine device rate (chained slope — relay-proof)
    r = device_time_fn(eng._fn, eng.params, jnp.asarray(xb), perturb_arg=1,
                       n_small=2, n_big=2 + iters)
    raw_ips = batch / (r["ms_median"] / 1e3)
    _emit(phase="serving", variant="raw_engine", batch=batch, dev=dev,
          ms_per_batch=round(r["ms_median"], 3), img_s=round(raw_ips, 1))

    eng(xb)  # compile via the __call__ path (padding etc.)

    # low-load latency: one client, sequential requests (wall — includes
    # relay RTT; the device ms/batch row above decomposes it)
    srv = InferenceServer(eng, max_wait_ms=2.0).start()
    lat = []
    for _ in range(20):
        t0 = time.perf_counter()
        srv.infer(x1)
        lat.append((time.perf_counter() - t0) * 1e3)
    lat.sort()
    _emit(phase="serving", variant="low_load_latency", batch=batch, dev=dev,
          p50_ms=round(lat[len(lat) // 2], 1), p90_ms=round(lat[18], 1),
          note="wall incl. relay RTT; single outstanding request")
    srv.stop()

    # closed-loop sustained throughput: many concurrent clients
    srv = InferenceServer(eng, max_wait_ms=5.0).start()
    stop_at = time.perf_counter() + seconds
    counts = [0] * clients
    lats: list = []
    lk = threading.Lock()

    def client(i):
        while time.perf_counter() < stop_at:
            t0 = time.perf_counter()
            srv.infer(x1, timeout=120.0)
            dt = (time.perf_counter() - t0) * 1e3
            counts[i] += 1
            with lk:
                lats.append(dt)

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client, args=(i,)) for i in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    total = sum(counts)
    lats.sort()
    _emit(phase="serving", variant="closed_loop", batch=batch, dev=dev,
          clients=clients, wall_s=round(wall, 2), items=total,
          items_per_s=round(total / wall, 1),
          mean_fill=round(srv.mean_fill, 3),
          batches=int(srv.stats["batches"]),
          p50_ms=round(lats[len(lats) // 2], 1) if lats else None,
          p99_ms=round(lats[int(len(lats) * 0.99)], 1) if lats else None,
          dispatcher_efficiency=round(total / wall / raw_ips, 3))
    srv.stop()


def phase_deep(iters=8, batches=(128, 256), depths=(50, 101, 152)):
    if _SMOKE:
        iters, batches, depths = 2, (8,), (50,)
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.bench.roofline import PEAKS, detect_chip
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, ObserveCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    chip = detect_chip()
    rng = np.random.default_rng(0)
    for depth in depths:
        cfg = ResNetConfig(depth=depth, num_classes=1000)
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        flat = flatten_folded(fold_resnet(params, cfg))
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                           INT8_PER_CHANNEL)
        qflat = quantize_weights(flat, INT8_PER_CHANNEL)

        def fp32_fwd(p, xb, _cfg=cfg):
            return qforward(ObserveCtx(p), xb, _cfg)

        def int8_fwd(p, xb, _cfg=cfg, _s=scales):
            return qforward_fused2(FullFusedCtx(p, _s, INT8_PER_CHANNEL),
                                   xb, _cfg)

        b0 = batches[0]
        x0 = jnp.asarray(rng.normal(0, 1, (b0, 224, 224, 3)), jnp.float32)
        r_fp32 = device_time_fn(fp32_fwd, flat, x0, perturb_arg=1,
                                n_small=2, n_big=2 + iters)
        ips_fp32 = b0 / (r_fp32["ms_median"] / 1e3)
        _emit(phase="deep", model=f"resnet{depth}", variant="fp32",
              batch=b0, ms=round(r_fp32["ms_median"], 3),
              img_s=round(ips_fp32, 1))

        # exactness gate at b0 (fused2 vs fp32 reference logits)
        lg_f = np.asarray(jax.jit(fp32_fwd)(flat, x0[:32]))
        lg_q = np.asarray(jax.jit(int8_fwd)(qflat, x0[:32]))
        agree = numerics.top1_agreement(lg_q, lg_f)
        cos = numerics.diff(lg_q, lg_f).cosine
        _emit(phase="deep", model=f"resnet{depth}", check="int8_vs_fp32",
              top1_agreement=agree, cosine=round(float(cos), 5))

        try:
            cost = (jax.jit(fp32_fwd).lower(flat, x0).compile()
                    .cost_analysis())
            if isinstance(cost, list):
                cost = cost[0]
            ops_img = float(cost.get("flops", 0.0)) / b0
        except Exception:
            ops_img = 0.0

        for b in batches:
            xb = jnp.asarray(rng.normal(0, 1, (b, 224, 224, 3)), jnp.float32)
            r = device_time_fn(int8_fwd, qflat, xb, perturb_arg=1,
                               n_small=2, n_big=2 + iters)
            ips = b / (r["ms_median"] / 1e3)
            tops = ops_img * ips / 1e12
            _emit(phase="deep", model=f"resnet{depth}", variant="int8_fused2",
                  batch=b, ms=round(r["ms_median"], 3), img_s=round(ips, 1),
                  vs_fp32=round(ips / ips_fp32, 2),
                  tops_eff=round(tops, 1),
                  pct_int8_peak=round(tops * 1e12 / PEAKS[chip]["int8"] * 100, 1)
                  if chip in PEAKS and ops_img else None)


def phase_u8(batch=384, iters=12):
    """uint8-ingest fused stem vs fp32 ingest on the headline fused2 path:
    the deploy engine takes raw decoded-JPEG uint8 NHWC (4x less input
    bandwidth; normalize folded into the stem conv — exact rewrite, tested
    in tests/test_real_image_e2e.py:87). Is the saved 173 MB/batch of
    input traffic visible at b384?"""
    if _SMOKE:
        batch, iters = 8, 2
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD
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

    rng = np.random.default_rng(0)
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    u8 = rng.integers(0, 256, (batch, 224, 224, 3)).astype(np.uint8)
    xn = ((u8.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
          ).astype(np.float32)
    calib = [jnp.asarray(xn[:8])]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)

    def fwd(p, xb):
        return qforward_fused2(FullFusedCtx(p, scales, INT8_PER_CHANNEL),
                               xb, cfg)

    lf = np.asarray(jax.jit(fwd)(qflat, jnp.asarray(xn[:32])))
    lu = np.asarray(jax.jit(fwd)(qflat, jnp.asarray(u8[:32])))
    d = numerics.diff(lu, lf)
    _emit(phase="u8", check="u8_vs_f32_ingest", cosine=round(float(d.cosine), 6),
          top1_agreement=numerics.top1_agreement(lu, lf))
    for name, x in (("f32_ingest", jnp.asarray(xn)), ("u8_ingest", jnp.asarray(u8))):
        r = device_time_fn(fwd, qflat, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        _emit(phase="u8", variant=name, batch=batch,
              ms=round(r["ms_median"], 3),
              img_s=round(batch / r["ms_median"] * 1e3, 1))


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    phases = sys.argv[1:] or ["info", "serving", "deep"]
    t0 = time.time()
    for ph in phases:
        {"info": phase_info, "serving": phase_serving, "deep": phase_deep,
         "u8": phase_u8,
         # relay wall-clock poisons TPU serving latency (1.8 s tunnel RTT
         # vs 3.4 ms device compute, runlogs/r4); the dispatcher-efficiency
         # number comes from a backend where wall time is sane
         "serving_cpu": lambda: phase_serving(batch=64, clients=256,
                                              seconds=10.0, iters=6,
                                              size=32, small=True),
         }[ph]()
        _emit(phase=ph, done=True, wall_s=round(time.time() - t0, 1))


if __name__ == "__main__":
    main()

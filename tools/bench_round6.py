#!/usr/bin/env python
"""Round-6 measurement campaigns.

Phases (run each as its own process; TPU phases strictly one at a time):

  info        backend + library versions (the libtpu-bump tripwire for the
              parked Mosaic retries — 0.0.34 all of rounds 1-5).
  serving_lat CPU-clock serving latency at 3 load points + overload reject,
              now WITH the device-bound columns (VERDICT r4 weak #5):
              wait_p50/p99 (measured queue + batch-assembly wait) plus the
              slope-measured device batch time -> p50/p99_bound_ms. Run with
              DLQ_PLATFORM=cpu.
  shapes      production-shape tile autotune (VERDICT r4 #4): sweep
              W8A8/W4A8/W4A16 candidates at the GEMM shapes the BASELINE
              models actually spend time in — ResNet-50/101/152 b128 late
              stage 1x1s, MNv2 b128 1x1s — and persist winners/negative
              verdicts to the tile cache (--write-table ships them).
  conv1x1     1x1-conv-as-GEMM retry WITH the autotuned full-K tiles: the
              round-3 exact-rewrite campaign measured GEMM rewrites slower,
              but it predates the +15% full-K tile discovery (r5 tiles3).
              A/B: XLA int8 conv vs XLA int8 dot vs Pallas autotuned GEMM
              at the late-stage shapes, bit-exactness asserted. (TPU)

Usage:  python tools/bench_round6.py [info serving_lat shapes conv1x1] [--write-table]
Writes one JSON line per measurement to stdout AND runlogs/r6/round6.jsonl.
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
                    "runlogs", "r6", "round6.jsonl")


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
          n_devices=len(jax.devices()), **ver)


# ---------------------------------------------------------------------------
# serving latency with the device-bound column
# ---------------------------------------------------------------------------

def phase_serving_lat():
    """CPU serving latency percentiles + the device-bound split: CPU p50/p99
    are dispatcher-clock end-to-end; wait_p50/p99 are the measured pre-device
    queue waits; p50/p99_bound_ms add the slope-measured device batch time."""
    import jax

    from dlq_tpu.engine import Engine
    from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward
    from dlq_tpu.serving import InferenceServer, ServerOverloaded
    from dlq_tpu.timing import device_time_fn

    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)

    def one_point(clients, per_client, batch=64, max_wait_ms=2.0,
                  overload="wait", max_queue=4096):
        eng = Engine.fp32(mlp_forward, params, cfg, batch=batch)
        eng.warmup((784,))
        # slope-measured device time for ONE engine batch at this batch size
        xb = rng.normal(0, 1, (batch, 784)).astype(np.float32)
        r = device_time_fn(lambda p, xx: eng._fn(p, xx), eng.params,
                           np.asarray(xb), n_small=2, n_big=8, perturb_arg=1)
        dev_ms = float(r["ms_median"])
        srv = InferenceServer(eng, max_wait_ms=max_wait_ms,
                              max_queue=max_queue, overload=overload).start()
        xs = rng.normal(0, 1, (clients, per_client, 784)).astype(np.float32)
        rejected = [0] * clients

        def worker(i):
            for j in range(per_client):
                try:
                    srv.infer(xs[i, j], timeout=120)
                except ServerOverloaded:
                    rejected[i] += 1
                    time.sleep(0.002)

        t0 = time.perf_counter()
        ths = [threading.Thread(target=worker, args=(i,)) for i in range(clients)]
        for t in ths:
            t.start()
        for t in ths:
            t.join()
        wall = time.perf_counter() - t0
        lat = srv.latency_stats()
        bound = srv.device_bound_latency(dev_ms)
        srv.stop()
        done = clients * per_client - sum(rejected)
        _emit(phase="serving_lat", clients=clients, per_client=per_client,
              batch=batch, overload=overload, max_queue=max_queue,
              completed=done, rejected=sum(rejected),
              throughput_req_s=round(done / wall, 1),
              qdepth_max=int(srv.stats["qdepth_max"]),
              mean_fill=round(srv.mean_fill, 3),
              **{k: round(v, 2) for k, v in lat.items()},
              **{k: round(v, 3) for k, v in bound.items()})

    one_point(clients=4, per_client=40)       # low load: latency floor
    one_point(clients=32, per_client=20)      # medium: batches fill
    one_point(clients=128, per_client=10)     # high: saturation
    one_point(clients=128, per_client=10,     # overload: bounded queue
              overload="reject", max_queue=64)


# ---------------------------------------------------------------------------
# production-shape autotune
# ---------------------------------------------------------------------------

# The GEMM-expressible (1x1-conv / dense) shapes that are >5% of runtime in
# a BASELINE model at b128 @224 (M = B*H*W of the stage, PADDED to the
# 256-row granule int8_matmul_padded keys its lookups on — entries recorded
# at the raw 6272 would never be hit at runtime). 3x3 convs are
# conv-emitter territory, not GEMMs, and are excluded by construction.
PRODUCTION_SHAPES = [
    # model, stage, (M_padded, K, N)
    ("resnet50/101/152", "stage3 1x1 reduce", (25088, 1024, 256)),
    ("resnet50/101/152", "stage3 1x1 expand", (25088, 256, 1024)),
    ("resnet50/101/152", "stage4 1x1 reduce", (6400, 2048, 512)),
    ("resnet50/101/152", "stage4 1x1 expand", (6400, 512, 2048)),
    ("resnet50/101/152", "stage4 downsample 1x1", (6400, 1024, 2048)),
    ("mobilenetv2", "head 1x1 320->1280", (6400, 320, 1280)),
]


def phase_shapes(write_table: bool = False):
    from dlq_tpu.ops.tile_autotune import (
        autotune_int8, autotune_w4a8, autotune_w4a16,
    )

    for model, site, (M, K, N) in PRODUCTION_SHAPES:
        e = autotune_int8(M, K, N)
        _emit(phase="shapes", kind="w8a8", model=model, site=site,
              M=M, K=K, N=N, **{k: e.get(k) for k in ("tm", "tn", "tk", "ms")},
              tried=[{k: r.get(k) for k in ("tm", "tn", "tk", "ms", "error")}
                     for r in e["tried"]])
        e = autotune_w4a8(M, K, N)
        _emit(phase="shapes", kind="w4a8", model=model, site=site,
              M=M, K=K, N=N, impl=e.get("impl"), ms=e.get("ms"),
              tried=e["tried"])
        if K % 128 == 0:
            e = autotune_w4a16(M, K, N)
            _emit(phase="shapes", kind="w4a16", model=model, site=site,
                  M=M, K=K, N=N, impl=e.get("impl"), tiles=e.get("tiles"),
                  ms=e.get("ms"), tried=e["tried"])
        else:
            _emit(phase="shapes", kind="w4a16", model=model, site=site,
                  M=M, K=K, N=N, verdict="skipped: K % 128 != 0 (group-wise "
                  "scales need whole groups per tile)")
    if write_table:
        _ship_table()


def _ship_table():
    """Merge the local measured cache into the shipped package table."""
    from dlq_tpu.ops.tile_autotune import TABLE_PATH, _load, cache_path

    local = dict(_load(cache_path()))
    shipped = dict(_load(TABLE_PATH))
    shipped.update(local)
    with open(TABLE_PATH, "w") as f:
        json.dump(shipped, f, indent=1, sort_keys=True)
    _emit(phase="shapes", shipped=len(local), table=TABLE_PATH)


# ---------------------------------------------------------------------------
# 1x1-conv-as-GEMM with autotuned tiles
# ---------------------------------------------------------------------------

def phase_conv1x1():
    """A/B the late-stage 1x1 convs as (a) XLA int8 NHWC conv, (b) XLA int8
    dot on the reshaped [B*H*W, C] view, (c) Pallas W8A8 GEMM with the
    autotuned tiles. All three are bit-exact (asserted); the question is
    whether the GEMM forms beat XLA's conv emitter now that the full-K tiles
    exist. Negative verdicts close VERDICT r4 weak #7's 'retries must re-run'
    obligation for the tile-dependent case without a libtpu bump."""
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import int8_matmul_padded
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    cases = [
        ("stage4 reduce b128", 128, 7, 2048, 512),
        ("stage4 expand b128", 128, 7, 512, 2048),
        ("stage3 reduce b128", 128, 14, 1024, 256),
    ]
    for name, B, hw, C, O in cases:
        M = B * hw * hw
        x4 = jnp.asarray(rng.integers(-127, 128, (B, hw, hw, C)), jnp.int8)
        w4 = jnp.asarray(rng.integers(-127, 128, (1, 1, C, O)), jnp.int8)
        x2 = x4.reshape(M, C)
        w2 = w4.reshape(C, O)
        scale = jnp.full((O,), 1e-3, jnp.float32)

        def conv_impl(xx, ww):
            acc = jax.lax.conv_general_dilated(
                xx, ww, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * scale

        def dot_impl(xx, ww):
            acc = jax.lax.dot(xx, ww, preferred_element_type=jnp.int32)
            return acc.astype(jnp.float32) * scale

        def pallas_impl(xx, ww):
            return int8_matmul_padded(xx, ww, scale)

        ref = np.asarray(conv_impl(x4, w4)).reshape(M, O)
        outs = {"dot": np.asarray(dot_impl(x2, w2)),
                "pallas": np.asarray(pallas_impl(x2, w2))}
        for k, o in outs.items():
            err = float(np.max(np.abs(o - ref)))
            assert err == 0.0, (name, k, err)

        row = {"phase": "conv1x1", "case": name, "M": M, "K": C, "N": O,
               "exact": True}
        for label, fn, args in (("conv_ms", conv_impl, (x4, w4)),
                                ("dot_ms", dot_impl, (x2, w2)),
                                ("pallas_ms", pallas_impl, (x2, w2))):
            r = device_time_fn(fn, *args, n_small=2, n_big=10, perturb_arg=0)
            row[label] = round(float(r["ms_median"]), 4)
        best = min(("conv_ms", "dot_ms", "pallas_ms"), key=row.__getitem__)
        row["winner"] = best.replace("_ms", "")
        row["gemm_vs_conv"] = round(row["conv_ms"] /
                                    min(row["dot_ms"], row["pallas_ms"]), 3)
        _emit(**row)


def phase_mm1x1(iters=8, depths=(50, 152), batch=128):
    """Model-level A/B of the mm1x1 rewrite (1x1/s1 conv -> int8 matmul) on
    the BOTTLENECK resnets at b128 @224 — the class where 1x1/s1 is ~2/3 of
    the FLOPs. Bit-exact is CI-gated (test_conv_rewrites); here the verdict
    is throughput. (TPU, own process.)"""
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

    rng = np.random.default_rng(0)
    for depth in depths:
        cfg = ResNetConfig(depth=depth, num_classes=1000)
        params = init_resnet(jax.random.PRNGKey(0), cfg)
        flat = flatten_folded(fold_resnet(params, cfg))
        calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                           INT8_PER_CHANNEL)
        qflat = quantize_weights(flat, INT8_PER_CHANNEL)
        x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)
        row = {"phase": "mm1x1", "model": f"resnet{depth}", "batch": batch}
        for label, rw in (("plain", ()), ("mm1x1", ("mm1x1",)),
                          ("mm1x1_down", ("mm1x1", "down_mm"))):
            def fwd(p, xb, _s=scales, _rw=rw, _cfg=cfg):
                return qforward_fused2(
                    FullFusedCtx(p, _s, INT8_PER_CHANNEL, rewrites=_rw),
                    xb, _cfg)

            r = device_time_fn(fwd, qflat, x, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            row[f"{label}_ms"] = round(float(r["ms_median"]), 3)
            row[f"{label}_img_s"] = round(batch / (r["ms_median"] / 1e3), 1)
        row["speedup"] = round(row["plain_ms"] / row["mm1x1_ms"], 4)
        _emit(**row)


def phase_mnv2_mm1x1(iters=8, batch=384):
    """Model-level A/B of mm1x1 through the production DeployCtx on
    MobileNetV2 (the body is mostly 1x1/s1 convs): W8A8 and W4A8, plain vs
    mm1x1. Bit-exact is CI-gated (test_deploy_mm1x1_mnv2_exact); this is
    the throughput verdict that decides the DeployCtx default. (TPU.)"""
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
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    cfg = MobileNetV2Config(num_classes=1000)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)
    for label, qcfg in (("w8a8", INT8_PER_CHANNEL),
                        ("w4a8", INT4A8_PER_CHANNEL)):
        scales = calibrate(make_sites_fn(qf, cfg), flat, calib, qcfg)
        qflat = quantize_weights(flat, qcfg)
        row = {"phase": "mnv2_mm1x1", "scheme": label, "batch": batch}
        for name, rw in (("plain", ()), ("mm1x1", ("mm1x1",))):
            def fwd(p, xb, _s=scales, _rw=rw, _q=qcfg):
                return qf(DeployCtx(p, _s, _q, rewrites=_rw), xb, cfg)

            r = device_time_fn(fwd, qflat, x, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            row[f"{name}_ms"] = round(float(r["ms_median"]), 3)
            row[f"{name}_img_s"] = round(batch / (r["ms_median"] / 1e3), 1)
        row["speedup"] = round(row["plain_ms"] / row["mm1x1_ms"], 4)
        _emit(**row)


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_table = "--write-table" in sys.argv
    phases = args or ["info"]
    for ph in phases:
        if ph == "info":
            phase_info()
        elif ph == "serving_lat":
            phase_serving_lat()
        elif ph == "shapes":
            phase_shapes(write_table=write_table)
        elif ph == "conv1x1":
            phase_conv1x1()
        elif ph == "mm1x1":
            phase_mm1x1()
        elif ph == "mnv2_mm1x1":
            phase_mnv2_mm1x1()
        else:
            raise SystemExit(f"unknown phase {ph}")


if __name__ == "__main__":
    main()

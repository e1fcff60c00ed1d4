"""Scaling-structure evidence (VERDICT r1 #9): verify the dp x tp engine's
collective/compute structure from the compiled HLO and the profiler trace.

Multi-chip silicon is unavailable here, so the >=85% efficiency number
cannot be measured — but the STRUCTURE that determines it can be checked
and the same check re-run unchanged on a real pod:

  1. compile the dp x tp int8 engine on the current mesh and assert XLA
     inserted boundary collectives (all-reduce / all-gather / collective-
     permute) — GSPMD partitioned the graph rather than replicating it;
  2. capture a jax.profiler trace of steady-state steps and parse the
     chrome-trace JSON: total collective busy-time vs compute busy-time vs
     wall span, and the overlap fraction (collective intervals intersected
     with concurrently-running compute intervals across tracks).

On the virtual CPU mesh (default here) the timing shares are not silicon-
representative; the pass criterion is structural (collectives present,
trace parseable, overlap computable). On a v5e pod the same tool reports
the real overlap fraction that backs the BASELINE scaling target.

Usage: python tools/scaling_trace_check.py [--devices 8] [--wire int8]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

COLLECTIVE_KEYS = ("all-reduce", "all-gather", "all-to-all",
                   "collective-permute", "reduce-scatter", "psum")


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def parse_trace(logdir):
    """Merge all chrome-trace files under logdir into interval lists."""
    coll, comp = [], []
    for path in glob.glob(os.path.join(logdir, "**", "*.trace.json.gz"),
                          recursive=True):
        with gzip.open(path, "rt") as f:
            data = json.load(f)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") != "X" or "dur" not in ev:
                continue
            name = str(ev.get("name", "")).lower()
            iv = (ev["ts"], ev["ts"] + ev["dur"])
            if any(k in name for k in COLLECTIVE_KEYS):
                coll.append(iv)
            elif any(k in name for k in ("fusion", "convolution", "dot",
                                         "matmul", "conv")):
                comp.append(iv)
    return coll, comp


def _merge(intervals):
    """Union-merge sorted intervals."""
    out = []
    for s, e in sorted(intervals):
        if out and s <= out[-1][1]:
            out[-1][1] = max(out[-1][1], e)
        else:
            out.append([s, e])
    return out


def interval_overlap_us(a, b):
    """Time within intervals `a` during which at least one interval of `b`
    is active (both sides union-merged — no double counting)."""
    if not a or not b:
        return 0.0
    a, b = _merge(a), _merge(b)
    starts = np.array([x[0] for x in b])
    ends = np.array([x[1] for x in b])
    total = 0.0
    for s, e in a:
        i = np.searchsorted(ends, s, side="right")
        while i < len(b) and starts[i] < e:
            total += max(0.0, min(e, ends[i]) - max(s, starts[i]))
            i += 1
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--wire", default="fp32", choices=["fp32", "bf16", "int8"])
    ap.add_argument("--logdir", default=None)
    args = ap.parse_args()

    import jax

    if len(jax.devices()) < args.devices:
        from jax.extend.backend import clear_backends

        clear_backends()
        jax.config.update("jax_num_cpu_devices", args.devices)
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from dlq_tpu.bench.profile import trace_capture
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    )
    from dlq_tpu.parallel.mesh import MeshConfig, make_mesh
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    n = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n // 2, model=2))
    _emit(devices=n, mesh={"data": n // 2, "model": 2}, wire=args.wire)

    cfg = ResNetConfig(depth=18, num_classes=64, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    B = 8 * n
    x = rng.normal(0, 1, (B, 32, 32, 3)).astype(np.float32)
    calib = [jnp.asarray(x[:16])]
    eng = Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                           calib_batches=calib, batch=B, mesh=mesh,
                           tensor_parallel=True, wire=args.wire)

    # ---- 1. compiled-HLO structural check ----
    from dlq_tpu.parallel.shard import shard_batch

    xs = shard_batch(jnp.asarray(x), mesh)
    compiled = eng._fn.lower(eng.params, xs).compile()
    hlo = compiled.as_text()
    counts = {k: hlo.count(k) for k in
              ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter", "dynamic-slice")}
    n_coll = sum(v for k, v in counts.items() if k != "dynamic-slice")
    _emit(check="hlo_collectives", counts=counts, ok=n_coll > 0)
    assert n_coll > 0, "GSPMD inserted no collectives — graph not partitioned"

    # ---- 2. trace capture + overlap parse ----
    import tempfile

    logdir = args.logdir or tempfile.mkdtemp(prefix="dlq_trace_")
    eng(x)  # warm
    with trace_capture(logdir):
        for _ in range(5):
            out = eng(x)
    np.asarray(out)
    coll, comp = parse_trace(logdir)
    coll_us = sum(e - s for s, e in coll)
    comp_us = sum(e - s for s, e in comp)
    ovl_us = interval_overlap_us(coll, comp)
    _emit(check="trace", logdir=logdir, collective_events=len(coll),
          compute_events=len(comp),
          collective_ms=round(coll_us / 1e3, 3),
          compute_ms=round(comp_us / 1e3, 3),
          overlap_ms=round(ovl_us / 1e3, 3),
          overlap_frac_of_collective=round(ovl_us / coll_us, 3) if coll_us else None)
    assert len(comp) > 0, "trace parsed no compute events"
    print("scaling_trace_check OK")


if __name__ == "__main__":
    main()

"""Profiling helpers: compiled cost analysis + trace capture.

The reference's per-kernel cudaEvent tables (SURVEY §5.1) map to two TPU
tools: XLA's compiled cost analysis (static FLOPs/bytes per executable —
feeds roofline ratios without running) and `jax.profiler` traces (true
per-op device timeline, viewable in TensorBoard/xprof).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable, Dict, Iterator, Optional

import jax


@contextlib.contextmanager
def trace_capture(logdir: str) -> Iterator[str]:
    """Capture a jax.profiler device trace into `logdir` (TensorBoard/xprof
    format) — the TPU-native replacement for the reference's per-kernel
    cudaEvent stream (`utils.hpp:85-92`). Validated on the axon relay by
    tools/bench_misc_sweep.profiler_trace_smoke."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


def cost_analysis(fn: Callable, *args, **kw) -> Dict[str, float]:
    """Lower+compile fn(*args) and return XLA's cost analysis
    (flops, bytes accessed, memory traffic) for the whole executable."""
    lowered = jax.jit(fn).lower(*args, **kw)
    compiled = lowered.compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns [dict]
        ca = ca[0] if ca else {}
    out = {}
    for k in ("flops", "bytes accessed", "optimal_seconds"):
        if k in ca:
            out[k.replace(" ", "_")] = float(ca[k])
    out["all"] = {k: float(v) for k, v in ca.items() if isinstance(v, (int, float))}
    return out


def model_roofline_estimate(
    fn: Callable, *args, ms_measured: Optional[float] = None,
    peak_tops: float = 394e12, hbm_gbs: float = 819e9, **kw
) -> Dict[str, Any]:
    """Static roofline position of a compiled model step: arithmetic
    intensity, compute-vs-bandwidth bound, and (given a measured time)
    fraction of the roofline ceiling achieved."""
    ca = cost_analysis(fn, *args, **kw)
    flops = ca.get("flops", 0.0)
    bytes_ = ca.get("bytes_accessed", 0.0)
    out: Dict[str, Any] = {"flops": flops, "bytes_accessed": bytes_}
    if bytes_ > 0:
        ai = flops / bytes_
        out["arithmetic_intensity"] = ai
        ridge = peak_tops / hbm_gbs
        out["bound"] = "compute" if ai >= ridge else "memory"
        t_compute = flops / peak_tops
        t_memory = bytes_ / hbm_gbs
        out["roofline_ms"] = max(t_compute, t_memory) * 1e3
        if ms_measured:
            out["fraction_of_roofline"] = out["roofline_ms"] / ms_measured
    return out

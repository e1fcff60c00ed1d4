"""Per-op / per-phase timing instrumentation.

Capability parity with the reference's two timing mechanisms: the cudaEvent
``Timer`` wrapping every kernel launch (`runtime/utils.hpp:85-92`, printed as
per-stage ms tables e.g. `infer_layer1.cu:240-241`), and the per-phase
``TimingStats`` breakdown in every MNIST version (`v3.c:8-25`, `v1.py:146-176`).

TPU-first redesign: on an async dispatch runtime there is no per-kernel event
stream to bracket — instead we (a) time whole jitted stages around
``block_until_ready`` (honest device time incl. dispatch), (b) expose
``jax.profiler`` trace capture for true per-op HLO timing, and (c) keep the
reference's "percent of total per phase" report format.
"""

from __future__ import annotations

import contextlib
import time
from collections import OrderedDict
from typing import Any, Dict, Optional

import jax


def _sync(x: Any) -> Any:
    """Block until all arrays in a pytree are ready."""
    for leaf in jax.tree_util.tree_leaves(x):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return x


class StageTimer:
    """Accumulates wall milliseconds per named stage across calls.

    >>> t = StageTimer()
    >>> with t.stage("conv1"):
    ...     y = conv(x); _ = t.sync(y)
    >>> print(t.report())
    """

    def __init__(self):
        self.ms: "OrderedDict[str, float]" = OrderedDict()
        self.calls: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, sync_result: Any = None):
        t0 = time.perf_counter()
        try:
            yield self
        finally:
            if sync_result is not None:
                _sync(sync_result)
            dt = (time.perf_counter() - t0) * 1e3
            self.ms[name] = self.ms.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def sync(self, x: Any) -> Any:
        return _sync(x)

    def add(self, name: str, ms: float) -> None:
        self.ms[name] = self.ms.get(name, 0.0) + ms
        self.calls[name] = self.calls.get(name, 0) + 1

    def total_ms(self) -> float:
        return sum(self.ms.values())

    def report(self, title: str = "timing") -> str:
        """The reference's per-phase table: ms, calls, % of total."""
        total = self.total_ms() or 1.0
        w = max([len(k) for k in self.ms] + [5])
        lines = [f"== {title} ==", f"{'stage':<{w}}  {'ms':>12}  {'calls':>6}  {'%':>6}"]
        for k, v in self.ms.items():
            lines.append(f"{k:<{w}}  {v:>12.3f}  {self.calls[k]:>6}  {100*v/total:>5.1f}%")
        lines.append(f"{'TOTAL':<{w}}  {total:>12.3f}")
        return "\n".join(lines)

    def to_json(self) -> Dict[str, Any]:
        return {
            "stages_ms": dict(self.ms),
            "calls": dict(self.calls),
            "total_ms": self.total_ms(),
        }


def time_fn(fn, *args, iters: int = 10, warmup: int = 2, **kw) -> Dict[str, float]:
    """Steady-state timing of a jitted callable: median/mean/best ms per call."""
    for _ in range(warmup):
        _sync(fn(*args, **kw))
    samples = []
    for _ in range(iters):
        t0 = time.perf_counter()
        _sync(fn(*args, **kw))
        samples.append((time.perf_counter() - t0) * 1e3)
    samples.sort()
    n = len(samples)
    med = samples[n // 2] if n % 2 else 0.5 * (samples[n // 2 - 1] + samples[n // 2])
    return {
        "ms_median": med,
        "ms_mean": sum(samples) / n,
        "ms_best": samples[0],
        "iters": float(n),
    }


@contextlib.contextmanager
def profiler_trace(logdir: Optional[str]):
    """Optional jax.profiler trace capture around a region (no-op if logdir
    is None) — the nsys/nvtx capability the reference lacked."""
    if logdir is None:
        yield
        return
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()

"""Continuous batched inference serving loop.

BASELINE's deployment story ("run continuous batched inference across
hosts"): a request queue feeding a fixed-batch engine. Requests accumulate
up to the engine batch or a max-wait deadline, run as one device step, and
results fan back out by request id. Single-threaded dispatcher; the engine's
jitted step runs async on device so the dispatcher overlaps batch assembly
with device compute.
"""

from __future__ import annotations

import collections
import dataclasses
import queue
import threading
import time
from typing import Any, Dict, List, Optional

import numpy as np

from dlq_tpu.engine import Engine


@dataclasses.dataclass
class _Request:
    rid: int
    x: np.ndarray
    done: threading.Event
    result: Optional[np.ndarray] = None


class InferenceServer:
    """Continuous batcher around an Engine.

    >>> srv = InferenceServer(engine, max_wait_ms=2.0); srv.start()
    >>> logits = srv.infer(image)          # blocking per-caller
    >>> srv.stop()
    """

    def __init__(self, engine: Engine, max_wait_ms: float = 5.0, max_queue: int = 4096):
        self.engine = engine
        self.max_wait_s = max_wait_ms / 1e3
        self.q: "queue.Queue[_Request]" = queue.Queue(max_queue)
        self._rid = 0
        self._lock = threading.Lock()
        self._stop = threading.Event()
        self._thread: Optional[threading.Thread] = None
        self.stats: Dict[str, Any] = collections.defaultdict(float)

    def start(self) -> "InferenceServer":
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()
        if self._thread:
            self._thread.join(timeout=10)

    def infer(self, x: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        """Submit one item ([...] without batch dim) and wait for its result."""
        with self._lock:
            self._rid += 1
            req = _Request(self._rid, np.asarray(x), threading.Event())
        self.q.put(req)
        if not req.done.wait(timeout):
            raise TimeoutError(f"request {req.rid} timed out")
        assert req.result is not None
        return req.result

    def infer_many(self, xs: np.ndarray, timeout: float = 120.0) -> np.ndarray:
        """Submit a whole array and wait once: all requests enqueue up
        front (the dispatcher packs them into full batches), then results
        gather in order. A sequential per-item loop would serialize one
        batch per item — enqueue-all is what lets the batcher batch."""
        reqs = []
        for x in xs:
            with self._lock:
                self._rid += 1
                req = _Request(self._rid, np.asarray(x), threading.Event())
            self.q.put(req)
            reqs.append(req)
        deadline = time.monotonic() + timeout
        for req in reqs:
            if not req.done.wait(max(0.0, deadline - time.monotonic())):
                raise TimeoutError(f"request {req.rid} timed out")
        return np.stack([r.result for r in reqs])

    def _resolve(self, pending) -> None:
        out_dev, batch = pending
        out = np.asarray(out_dev)  # sync point
        for i, r in enumerate(batch):
            r.result = out[i]
            r.done.set()

    def _loop(self) -> None:
        B = self.engine.batch
        pending = None  # (device_logits, requests) — the in-flight batch
        while not self._stop.is_set():
            batch: List[_Request] = []
            deadline = None
            while len(batch) < B:
                try:
                    wait = self.max_wait_s if deadline is None else max(0.0, deadline - time.perf_counter())
                    req = self.q.get(timeout=wait if batch else 0.05)
                except queue.Empty:
                    break  # deadline hit (partial batch) or idle: re-check stop
                batch.append(req)
                if deadline is None:
                    deadline = time.perf_counter() + self.max_wait_s
                if self._stop.is_set():
                    break
            if not batch:
                # idle: flush the in-flight batch so low-load latency never
                # waits on a successor that may not come
                if pending is not None:
                    self._resolve(pending)
                    pending = None
                continue
            xs = np.stack([r.x for r in batch])
            t0 = time.perf_counter()
            # double-buffer: dispatch this batch (async), THEN resolve the
            # previous one — device compute overlaps result distribution
            out_dev = self.engine.dispatch(xs)
            if pending is not None:
                self._resolve(pending)
            pending = (out_dev, batch)
            self.stats["batches"] += 1
            self.stats["items"] += len(batch)
            self.stats["device_s"] += time.perf_counter() - t0
            self.stats["fill"] += len(batch) / B
            if self.q.empty():
                self._resolve(pending)
                pending = None
        if pending is not None:
            self._resolve(pending)

    @property
    def mean_fill(self) -> float:
        return self.stats["fill"] / max(1, self.stats["batches"])

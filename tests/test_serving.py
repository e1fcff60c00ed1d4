"""Continuous-batching inference server tests."""

import threading

import jax
import numpy as np

from dlq_tpu.engine import Engine
from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward
from dlq_tpu.serving import InferenceServer


def _make_server(batch=4, max_wait_ms=10.0):
    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    eng = Engine.fp32(mlp_forward, params, cfg, batch=batch)
    return InferenceServer(eng, max_wait_ms=max_wait_ms).start(), params, cfg


def test_single_request_partial_batch():
    srv, params, cfg = _make_server()
    try:
        x = np.random.default_rng(0).normal(0, 1, (784,)).astype(np.float32)
        out = srv.infer(x, timeout=30)
        ref = np.asarray(mlp_forward(params, x[None], cfg))[0]
        np.testing.assert_allclose(out, ref, atol=1e-5)
    finally:
        srv.stop()


def test_concurrent_requests_batched():
    srv, params, cfg = _make_server(batch=8, max_wait_ms=50.0)
    try:
        rng = np.random.default_rng(1)
        xs = rng.normal(0, 1, (16, 784)).astype(np.float32)
        results = [None] * 16

        def worker(i):
            results[i] = srv.infer(xs[i], timeout=60)

        threads = [threading.Thread(target=worker, args=(i,)) for i in range(16)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        ref = np.asarray(mlp_forward(params, xs, cfg))
        np.testing.assert_allclose(np.stack(results), ref, atol=1e-5)
        # concurrency should have produced multi-item batches
        assert srv.stats["batches"] <= 16
        assert srv.stats["items"] == 16
    finally:
        srv.stop()


def test_server_stops_cleanly():
    srv, _, _ = _make_server()
    srv.stop()
    assert not srv._thread.is_alive()


def test_infer_many_batches_not_lockstep():
    """infer_many enqueues everything up front, so a single caller's 16
    items pack into full batches instead of one serialized batch per item."""
    srv, params, cfg = _make_server(batch=8, max_wait_ms=20.0)
    try:
        rng = np.random.default_rng(2)
        xs = rng.normal(0, 1, (16, 784)).astype(np.float32)
        out = srv.infer_many(xs, timeout=60)
        ref = np.asarray(mlp_forward(params, xs, cfg))
        np.testing.assert_allclose(out, ref, atol=1e-5)
        assert srv.stats["batches"] <= 4  # 16 items / batch 8 (+ slack)
    finally:
        srv.stop()

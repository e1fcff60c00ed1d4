"""Per-shape tile autotune: cache round-trip, measured selection, routing."""

import numpy as np
import jax.numpy as jnp
import pytest

from dlq_tpu.ops import pallas_matmul as PM
from dlq_tpu.ops import tile_autotune as TA


@pytest.fixture()
def tmp_cache(tmp_path, monkeypatch):
    monkeypatch.setenv("DLQ_COMPILE_CACHE", str(tmp_path))
    return tmp_path


def test_record_lookup_roundtrip(tmp_cache):
    assert TA.lookup("w8a8", 512, 512, 512) is None
    path = TA.record("w8a8", 512, 512, 512,
                     {"tm": 256, "tn": 512, "tk": 512, "ms": 1.0})
    assert str(tmp_cache) in path
    e = TA.lookup("w8a8", 512, 512, 512)
    assert e["tm"] == 256 and e["ms"] == 1.0
    # different shape -> miss
    assert TA.lookup("w8a8", 512, 512, 1024) is None
    # merge-on-write keeps prior entries
    TA.record("w8a8", 512, 512, 1024, {"tm": 512, "tn": 512, "tk": 512, "ms": 2.0})
    assert TA.lookup("w8a8", 512, 512, 512)["tm"] == 256


def test_autotune_int8_measures_and_persists(tmp_cache):
    e = TA.autotune_int8(256, 256, 256, candidates=[(256, 256, 256),
                                                    (128, 128, 256)], iters=2)
    assert e["ms"] is not None and e["ms"] > 0
    assert len([r for r in e["tried"] if r["ms"] is not None]) == 2
    # persisted: a fresh lookup returns the same winner
    got = TA.lookup("w8a8", 256, 256, 256)
    assert got["tm"] == e["tm"] and got["ms"] == e["ms"]


def test_padded_matmul_uses_cached_tiles(tmp_cache):
    """int8_matmul_padded resolves tiles from the cache; numerics unchanged."""
    rng = np.random.default_rng(0)
    M, K, N = 200, 256, 256
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.full((N,), 1e-3, jnp.float32)
    ref = np.asarray(PM.int8_matmul_padded(x, w, scale))
    TA.record("w8a8", 256, K, N, {"tm": 128, "tn": 128, "tk": 256, "ms": 0.5})
    out = np.asarray(PM.int8_matmul_padded(x, w, scale))
    np.testing.assert_array_equal(out, ref)


def test_int4_auto_routes_on_cache(tmp_cache, monkeypatch):
    """int4_matmul_auto prefers the measured impl over the M crossover."""
    rng = np.random.default_rng(1)
    M, K, N, group = 64, 256, 128, 128
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.float32)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scales = jnp.full((K // group, N), 1e-2, jnp.float32)

    calls = []
    real = PM.int4_matmul_xla2

    def spy(*a, **k):
        calls.append("xla2")
        return real(*a, **k)

    monkeypatch.setattr(PM, "int4_matmul_xla2", spy)
    PM.int4_matmul_auto(x, wp, scales, group=group)  # M=64 < threshold
    assert calls == ["xla2"]
    # a measured verdict for this exact shape overrides the crossover
    TA.record("w4a16", M, K, N, {"impl": "fused", "ms": 0.1, "group": group})
    calls.clear()
    out = np.asarray(PM.int4_matmul_auto(x, wp, scales, group=group))
    assert calls == []  # did NOT take the xla2 crossover branch
    ref = np.asarray(real(x, wp, scales, group=group))
    np.testing.assert_allclose(out, ref, rtol=2e-2, atol=2e-2)
    # tile-aware entry: winning tiles pass through, numerics unchanged
    TA.record("w4a16", M, K, N, {"impl": "fused", "ms": 0.1, "group": group,
                                 "tiles": {"tm": 64, "tn": 128, "tk": 256}})
    out2 = np.asarray(PM.int4_matmul_auto(x, wp, scales, group=group))
    np.testing.assert_allclose(out2, ref, rtol=2e-2, atol=2e-2)


def test_error_reason_never_raises():
    """The sweep's error handler must survive ANY exception shape — a bare
    assert from a compile path once would have IndexError'd the handler
    and killed the campaign (round-6 self-review finding)."""
    from dlq_tpu.ops.tile_autotune import _error_reason

    assert _error_reason(AssertionError()) == "AssertionError"
    assert _error_reason(RuntimeError("")) == "RuntimeError"
    assert (_error_reason(RuntimeError("implausible measurement: x"))
            == "implausible_measurement")
    assert _error_reason(RuntimeError("Mosaic layout oops")) == "compile_failed"
    assert _error_reason(RuntimeError("plain reason\nmore")) == "plain reason"


def test_record_survives_frozen_mtime(tmp_cache):
    """Back-to-back record() calls within one mtime tick must not lose
    entries (the memoized parse is cleared on write)."""
    import os

    from dlq_tpu.ops.tile_autotune import _load, cache_path, record

    record("w8a8", 1, 2, 3, {"tm": 1, "tn": 2, "tk": 3, "ms": 0.5})
    m0 = os.path.getmtime(cache_path())
    record("w8a8", 4, 5, 6, {"tm": 4, "tn": 5, "tk": 6, "ms": 0.6})
    os.utime(cache_path(), (m0, m0))  # freeze mtime at the first write's
    record("w8a8", 7, 8, 9, {"tm": 7, "tn": 8, "tk": 9, "ms": 0.7})
    os.utime(cache_path(), (m0, m0))
    data = dict(_load(cache_path()))
    keys = [k for k in data if k.startswith("w8a8:")]
    assert len(keys) == 3, keys

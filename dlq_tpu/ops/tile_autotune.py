"""Measure-once-and-cache tile selection for the Pallas matmuls.

The fused matmul kernels (`ops/pallas_matmul`) shipped with tile constants
tuned at exactly one shape (4096³) and hand-measured routing crossovers
(`int4_matmul_auto` m_threshold). This module makes tile choice a measured,
per-shape property (VERDICT r3 #5):

  * ``lookup(kind, M, K, N)`` — best known config for a (kernel-kind, shape,
    device-kind) key. Resolution order: the local measured cache (persisted
    next to the XLA compile cache, ``<DEFAULT_COMPILE_CACHE>/tiles.json``)
    → the committed table of v5e measurements shipped with the package
    (``ops/tile_table.json``) → None (callers keep their defaults).
  * ``autotune_int8 / autotune_w4a16 / autotune_w4a8`` — run 3-5 candidate
    configs through the chained-slope timer on the live device, persist the
    winner, return it. One measurement per (shape, device) ever; the cache
    makes every later process a dictionary hit.

Reference tie: the reference hand-tuned TILE=32 once for every GEMM shape
(`sgemm_tiled.cu:2`); here the tile is a measured function of shape.
"""

from __future__ import annotations

import functools
import json
import os
from typing import Any, Dict, List, Optional, Tuple

from dlq_tpu.platform import DEFAULT_COMPILE_CACHE

TABLE_PATH = os.path.join(os.path.dirname(__file__), "tile_table.json")


def cache_path() -> str:
    base = os.environ.get("DLQ_COMPILE_CACHE", DEFAULT_COMPILE_CACHE)
    if base.lower() in ("0", "off", "false", "no", "", "1", "true"):
        base = DEFAULT_COMPILE_CACHE
    return os.path.join(os.path.expanduser(base), "tiles.json")


def _device_kind() -> str:
    try:
        import jax

        return str(jax.devices()[0].device_kind).replace(" ", "_")
    except Exception:
        return "unknown"


def _key(kind: str, M: int, K: int, N: int, dev: str) -> str:
    return f"{kind}:{M}x{K}x{N}:{dev}"


@functools.lru_cache(maxsize=64)
def _load_at(path: str, mtime: float) -> Dict[str, Any]:
    try:
        with open(path) as f:
            return json.load(f)
    except Exception:
        return {}


def _load(path: str) -> Dict[str, Any]:
    """Parsed table, memoized on (path, mtime) — lookup() runs per matmul
    call in eager/interpret paths, and re-reading the 392-line shipped table
    each time was measurable (ADVICE r4 #4). Treat the result as read-only."""
    try:
        mtime = os.path.getmtime(path)
    except OSError:
        return {}
    return _load_at(path, mtime)


def lookup(kind: str, M: int, K: int, N: int) -> Optional[Dict[str, Any]]:
    """Best known config for this kernel kind + shape on this device kind,
    or None if never measured (callers then use their built-in defaults)."""
    dev = _device_kind()
    k = _key(kind, M, K, N, dev)
    for path in (cache_path(), TABLE_PATH):
        e = _load(path).get(k)
        if e:
            return e
    return None


def record(kind: str, M: int, K: int, N: int, entry: Dict[str, Any]) -> str:
    """Persist a measured winner into the local cache (merge-on-write)."""
    path = cache_path()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    data = dict(_load(path))  # copy: _load's result is memoized/shared
    data[_key(kind, M, K, N, _device_kind())] = entry
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(data, f, indent=1, sort_keys=True)
    os.replace(tmp, path)
    # drop the memoized parse: on coarse-mtime filesystems the rewrite may
    # not advance mtime, and a stale cached dict would make the NEXT
    # record() merge from old contents and silently lose this entry
    _load_at.cache_clear()
    return path


def _divides(t: Tuple[int, int, int], M: int, K: int, N: int) -> bool:
    tm, tn, tk = t
    return M % tm == 0 and N % tn == 0 and K % tk == 0


DEFAULT_INT8_TILES = (512, 1024, 2048)  # safe default; measured winners below
INT8_CANDIDATES: List[Tuple[int, int, int]] = [
    DEFAULT_INT8_TILES,
    (512, 1024, 512),   # the pre-r5 default
    (512, 512, 4096),   # full-K: 84% of int8 peak at 4096^3 (r5 sweep)
    (256, 512, 4096),   # full-K small-M: +34% at M=256
    (1024, 512, 512),
]


# chip peaks for the plausibility guard (v5e; other chips only loosen it)
_PEAK_TOPS = {"w8a8": 394e12, "w4a8": 394e12, "w4a16": 197e12}


def _error_reason(e: Exception) -> str:
    """Short machine-readable reason for a failed candidate. The persisted
    table is package data — raw backend error text (relay URLs, ANSI escapes)
    does not belong in it (ADVICE r4 #5); full text goes to runlogs only."""
    s = str(e)
    if "implausible measurement" in s:
        return "implausible_measurement"
    if any(m in s for m in ("remote_compile", "tpu_compile_helper", "Mosaic",
                            "RESOURCE_EXHAUSTED", "vmem", "VMEM", "INTERNAL")):
        return "compile_failed"
    # empty-message exceptions (bare assert etc.) must not crash the sweep's
    # error handler — fall back to the exception type name
    first = (s.splitlines() or [""])[0][:80]
    return first or type(e).__name__


def _measure(fn, *args, iters: int = 8, kind: str | None = None,
             mnk: tuple | None = None) -> float:
    """Chained-slope ms with a ROOFLINE PLAUSIBILITY guard: a relay stall
    during the short-chain sample can deflate the slope into a 'winner'
    faster than the hardware peak (seen once in r5: a bf16-family kernel
    'measuring' 293 TF against a 197 TF peak, which then shipped in the
    table). Any sample implying > peak re-measures; twice-implausible
    raises so the caller records an error row instead of a corrupt one."""
    from dlq_tpu.timing import device_time_fn

    for attempt in range(2):
        r = device_time_fn(fn, *args, n_small=2, n_big=2 + iters,
                           perturb_arg=0)
        ms = float(r["ms_median"])
        if kind is None or mnk is None:
            return ms
        M, K, N = mnk
        tops = 2.0 * M * N * K / (ms / 1e3)
        if tops <= _PEAK_TOPS.get(kind, float("inf")):
            return ms
    raise RuntimeError(
        f"implausible measurement: {ms:.4f} ms implies {tops/1e12:.1f} TOPS "
        f"> {_PEAK_TOPS[kind]/1e12:.0f} peak for {kind} at {mnk} (relay "
        "stall corrupted the slope) — candidate not recorded")


def autotune_int8(M: int, K: int, N: int,
                  candidates: Optional[List[Tuple[int, int, int]]] = None,
                  iters: int = 8) -> Dict[str, Any]:
    """Measure W8A8 tile candidates at (M, K, N) on the live device, persist
    the winner. Candidates that don't divide the shape are skipped; if none
    divide, the kernel's own min() clamping applies and we record defaults."""
    import jax.numpy as jnp
    import numpy as np

    from dlq_tpu.ops.pallas_matmul import int8_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.full((N,), 1e-3, jnp.float32)
    cands = [c for c in (candidates or INT8_CANDIDATES)
             if _divides((min(c[0], M), min(c[1], N), min(c[2], K)), M, K, N)]
    if not cands:
        cands = [DEFAULT_INT8_TILES]
    rows = []
    for tm, tn, tk in cands:
        def run(xx, ww):
            return int8_matmul(xx, ww, scale, None, tm=tm, tn=tn, tk=tk)

        try:
            ms = _measure(run, x, w, iters=iters, kind="w8a8", mnk=(M, K, N))
        except Exception as e:  # compile failure / implausible measurement
            rows.append({"tm": tm, "tn": tn, "tk": tk, "ms": None,
                         "error": _error_reason(e)})
            continue
        rows.append({"tm": tm, "tn": tn, "tk": tk, "ms": round(ms, 4)})
    ok = [r for r in rows if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else {
        "tm": DEFAULT_INT8_TILES[0], "tn": DEFAULT_INT8_TILES[1],
        "tk": DEFAULT_INT8_TILES[2], "ms": None}
    entry = {**best, "tried": rows, "iters": iters}
    record("w8a8", M, K, N, entry)
    return entry


def autotune_w4a16(M: int, K: int, N: int, group: int = 128,
                   iters: int = 8) -> Dict[str, Any]:
    """Measure the W4A16 implementations (two-pass XLA dequant vs fused
    in-register unpack vs k-cached unpack) at (M, K, N); persist the winning
    impl so `int4_matmul_auto` routes on measurement instead of the
    hand-coded m_threshold crossover."""
    import jax.numpy as jnp
    import numpy as np

    from dlq_tpu.ops.pallas_matmul import (
        int4_matmul, int4_matmul_cached, int4_matmul_xla2,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scales = jnp.full((K // group, N), 1e-2, jnp.float32)
    # (impl, tiles): tiles=None means the kernel's defaults; explicit tile
    # rows let the router pass the winning tiles through (r5: large-tk wins
    # +12% at 4096^3, but some combos exceed VMEM — failures are recorded)
    cands = [
        ("xla2", None),
        ("fused", None),
        ("fused", {"tm": 512, "tn": 512, "tk": 2048}),
        ("fused", {"tm": 1024, "tn": 512, "tk": 1024}),  # the pre-r5 default
        ("cached", None),
        ("cached", {"tn": 512}),
    ]

    def runner(impl, tiles):
        kw = dict(tiles or {})
        if impl == "xla2":
            return lambda xx, ww: int4_matmul_xla2(xx, ww, scales, group=group)
        if impl == "cached":
            return lambda xx, ww: int4_matmul_cached(xx, ww, scales,
                                                     group=group, **kw)
        return lambda xx, ww: int4_matmul(xx, ww, scales, group=group, **kw)

    rows = []
    for name, tiles in cands:
        try:
            ms = _measure(runner(name, tiles), x, wp, iters=iters,
                          kind="w4a16", mnk=(M, K, N))
            rows.append({"impl": name, "tiles": tiles, "ms": round(ms, 4)})
        except Exception as e:
            rows.append({"impl": name, "tiles": tiles, "ms": None,
                         "error": _error_reason(e)})
    ok = [r for r in rows if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else {"impl": "xla2",
                                                      "tiles": None, "ms": None}
    entry = {**best, "tried": rows, "group": group, "iters": iters}
    record("w4a16", M, K, N, entry)
    return entry


def autotune_w4a8(M: int, K: int, N: int, iters: int = 8) -> Dict[str, Any]:
    """Measure the W4A8 kernels (per-tile unpack vs k-cached unpack) at
    (M, K, N); persist the winner."""
    import jax.numpy as jnp
    import numpy as np

    from dlq_tpu.ops.pallas_matmul import int4a8_matmul, int4a8_matmul_cached

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scale = jnp.full((N,), 1e-3, jnp.float32)
    impls = {
        "plain": lambda xx, ww: int4a8_matmul(xx, ww, scale),
        "cached": lambda xx, ww: int4a8_matmul_cached(xx, ww, scale),
        "cached_tn512": lambda xx, ww: int4a8_matmul_cached(xx, ww, scale,
                                                            tn=512),
    }
    rows = []
    for name, fn in impls.items():
        try:
            ms = _measure(fn, x, wp, iters=iters, kind="w4a8", mnk=(M, K, N))
            rows.append({"impl": name, "ms": round(ms, 4)})
        except Exception as e:
            rows.append({"impl": name, "ms": None, "error": _error_reason(e)})
    ok = [r for r in rows if r["ms"] is not None]
    best = min(ok, key=lambda r: r["ms"]) if ok else {"impl": "plain", "ms": None}
    entry = {**best, "tried": rows, "iters": iters}
    record("w4a8", M, K, N, entry)
    return entry

"""TPU sweep round 5: k-cached-unpack int4 kernels (unpack once per weight
tile, reused across M-tiles via K-spanning VMEM scratch) vs the uncached
kernels, 4096^3. Targets the measured unpack overhead: W4A8 200 -> ~260
TOPS, W4A16 126 -> ~160 TF if the cache compiles and DMA pipelining holds.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def main(iters=6):
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_matmul import (
        int4_matmul, int4_matmul_cached, int4a8_matmul, int4a8_matmul_cached,
    )
    from dlq_tpu.quant.quantize import pack_int4
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    M = K = N = 4096
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    x8 = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    xf = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    scale = jnp.asarray(rng.random(N) * 0.01 + 0.001, jnp.float32)
    g = 128
    gs = jnp.asarray((rng.random((K // g, N)) * 0.05 + 0.01), jnp.float32)

    runs = []
    runs.append(("int4a8_uncached_anchor", x8,
                 lambda xb: int4a8_matmul(xb, packed, scale, None)))
    for tm, tn, tk in ((512, 1024, 2048), (512, 1024, 4096), (256, 1024, 2048),
                      (512, 512, 2048), (1024, 1024, 2048), (512, 2048, 2048)):
        runs.append((f"int4a8_cached_tm{tm}_tn{tn}_tk{tk}", x8,
                     lambda xb, _m=tm, _n=tn, _k=tk: int4a8_matmul_cached(
                         xb, packed, scale, None, tm=_m, tn=_n, tk=_k)))
    runs.append(("int4_w4a16_uncached_anchor", xf,
                 lambda xb: int4_matmul(xb, packed, gs, None, group=g)))
    for tm, tn, tk in ((1024, 512, 1024), (512, 512, 1024), (1024, 512, 2048),
                      (512, 1024, 1024), (256, 512, 1024)):
        runs.append((f"int4_w4a16_cached_tm{tm}_tn{tn}_tk{tk}", xf,
                     lambda xb, _m=tm, _n=tn, _k=tk: int4_matmul_cached(
                         xb, packed, gs, None, group=g, tm=_m, tn=_n, tk=_k)))

    for name, xarg, fn in runs:
        try:
            r = device_time_fn(fn, xarg, n_small=2, n_big=2 + iters,
                               perturb_arg=0)
            ms = r["ms_median"]
            tops = 2 * M * N * K / (ms * 1e-3) / 1e12
            peak = 394 if "a8" in name else 197
            _emit(variant=name, ms=round(ms, 4), tops=round(tops, 1),
                  pct_peak=round(tops / peak * 100, 1))
        except Exception as e:
            _emit(variant=name, error=f"{type(e).__name__}: {str(e)[:140]}")


if __name__ == "__main__":
    main()

"""TPU sweep round 4: W4A8 Pallas matmul roofline (int4 weights unpacked to
int8 in-register, int8 MXU dots) — tile sweep at 4096^3 against the 394-TOPS
int8 roofline, plus the W8A8 kernel re-measure as the same-process anchor.
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

    from dlq_tpu.ops.pallas_matmul import int4a8_matmul, int8_matmul
    from dlq_tpu.quant.quantize import pack_int4
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    M = K = N = 4096
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    q = rng.integers(-8, 8, (K, N)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    w8 = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.random(N) * 0.01 + 0.001, jnp.float32)

    r = device_time_fn(lambda xb: int8_matmul(xb, w8, scale, None),
                       x, perturb_arg=0, n_small=2, n_big=2 + iters)
    tops = 2 * M * N * K / (r["ms_median"] * 1e-3) / 1e12
    _emit(variant="int8_anchor", ms=round(r["ms_median"], 4),
          tops=round(tops, 1), pct_int8_peak=round(tops / 394 * 100, 1))

    for tm, tn, tk in ((512, 1024, 1024), (512, 1024, 2048), (256, 1024, 1024),
                       (1024, 1024, 1024), (512, 512, 1024), (512, 2048, 1024),
                       (512, 1024, 512)):
        try:
            r = device_time_fn(
                lambda xb, _m=tm, _n=tn, _k=tk: int4a8_matmul(
                    xb, packed, scale, None, tm=_m, tn=_n, tk=_k),
                x, perturb_arg=0, n_small=2, n_big=2 + iters)
            ms = r["ms_median"]
            tops = 2 * M * N * K / (ms * 1e-3) / 1e12
            _emit(variant=f"int4a8_tm{tm}_tn{tn}_tk{tk}", ms=round(ms, 4),
                  tops=round(tops, 1), pct_int8_peak=round(tops / 394 * 100, 1))
        except Exception as e:
            _emit(variant=f"int4a8_tm{tm}_tn{tn}_tk{tk}",
                  error=f"{type(e).__name__}: {str(e)[:160]}")


if __name__ == "__main__":
    main()

"""Kernel roofline harness: measured FLOPs vs chip peak.

BASELINE target: fused int8 dequant+matmul at >= 80% of the int8 matmul
roofline per chip. Peaks (per chip):

  v5e:  bf16 197 TFLOP/s, int8 394 TOP/s, HBM 819 GB/s
  v5p:  bf16 459 TFLOP/s, int8 918 TOP/s, HBM 2765 GB/s

The harness times a kernel at steady state and reports achieved TOP/s and
fraction-of-peak — the reference's per-kernel ms methodology
(`utils.hpp:85-92`) upgraded to a roofline model.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.timing import device_time_fn

PEAKS: Dict[str, Dict[str, float]] = {
    # TFLOP/s (bf16), TOP/s (int8), GB/s HBM
    "v5e": {"bf16": 197e12, "int8": 394e12, "hbm": 819e9},
    "v5p": {"bf16": 459e12, "int8": 918e12, "hbm": 2765e9},
    "cpu": {"bf16": 1e12, "int8": 1e12, "hbm": 100e9},  # placeholder
}


def detect_chip() -> str:
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", "").lower()
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    if "v5p" in kind or "v5" in kind:
        return "v5p"
    return "cpu" if dev.platform == "cpu" else "v5e"


def measure_matmul_kernel(
    fn: Callable,
    M: int,
    K: int,
    N: int,
    dtype: str = "int8",
    iters: int = 20,
    chip: Optional[str] = None,
    args=None,
) -> Dict[str, float]:
    """Time fn(*args) computing a [M,K]x[K,N] matmul via the chained-slope
    method (honest device time even on async/relay backends); report
    achieved ops/s and fraction of `dtype` peak."""
    chip = chip or detect_chip()
    r = device_time_fn(fn, *args, n_small=2, n_big=2 + iters)
    flops = 2.0 * M * N * K
    achieved = flops / (r["ms_median"] / 1e3)
    peak = PEAKS[chip][dtype]
    return {
        "ms_median": r["ms_median"],
        "tops_achieved": achieved / 1e12,
        "tops_peak": peak / 1e12,
        "fraction_of_peak": achieved / peak,
        "chip": chip,  # type: ignore[dict-item]
    }


def int8_matmul_roofline(M=4096, K=4096, N=4096, iters=20, **kw) -> Dict[str, float]:
    from dlq_tpu.ops.pallas_matmul import int8_matmul

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.ones((N,), jnp.float32)

    def run(xx, ww):
        return int8_matmul(xx, ww, scale, None, **kw)

    return measure_matmul_kernel(run, M, K, N, dtype="int8", iters=iters, args=(x, w))


def xla_int8_matmul_roofline(M=4096, K=4096, N=4096, iters=20) -> Dict[str, float]:
    """XLA's own int8 dot as the comparison point for the Pallas kernel."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (K, N)), jnp.int8)
    scale = jnp.ones((N,), jnp.float32)
    f = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.int32)
                .astype(jnp.float32) * scale)

    return measure_matmul_kernel(f, M, K, N, dtype="int8", iters=iters, args=(x, w))


def bf16_matmul_roofline(M=4096, K=4096, N=4096, iters=20) -> Dict[str, float]:
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    w = jnp.asarray(rng.normal(0, 1, (K, N)), jnp.bfloat16)
    f = jax.jit(lambda a, b: jax.lax.dot(a, b, preferred_element_type=jnp.float32))

    return measure_matmul_kernel(f, M, K, N, dtype="bf16", iters=iters, args=(x, w))


def int4_matmul_roofline(M=4096, K=4096, N=4096, group=128, iters=20,
                         cached=False) -> Dict[str, float]:
    from dlq_tpu.ops.pallas_matmul import int4_matmul, int4_matmul_cached

    kernel = int4_matmul_cached if cached else int4_matmul
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (M, K)), jnp.bfloat16)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scales = jnp.asarray(rng.random((K // group, N)), jnp.float32)

    def run(xx, wpp):
        return kernel(xx, wpp, scales, None, group=group)

    return measure_matmul_kernel(run, M, K, N, dtype="bf16", iters=iters, args=(x, wp))


def int4a8_matmul_roofline(M=4096, K=4096, N=4096, iters=20,
                           cached=False) -> Dict[str, float]:
    """W4A8: int4 weights on the int8 MXU rate (per-OC scales)."""
    from dlq_tpu.ops.pallas_matmul import int4a8_matmul, int4a8_matmul_cached

    kernel = int4a8_matmul_cached if cached else int4a8_matmul
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-127, 128, (M, K)), jnp.int8)
    wp = jnp.asarray(rng.integers(0, 256, (K // 2, N)), jnp.uint8)
    scale = jnp.ones((N,), jnp.float32)

    def run(xx, wpp):
        return kernel(xx, wpp, scale, None)

    return measure_matmul_kernel(run, M, K, N, dtype="int8", iters=iters, args=(x, wp))

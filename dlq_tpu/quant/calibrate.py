"""Activation calibration: fit per-site static scales from fp32 batches.

This is the jit-compiled JAX pass BASELINE.json calls for ("quantization
calibration (scale/zero-point fitting, per-channel stats) becomes a
jit-compiled JAX pass"). A model's forward exposes *sites* (each quantized
op's input); `collect` folds per-batch site statistics into running stats;
`fit_scales` turns stats into scales.

Methods:
  minmax      — running abs-max (the classic PTQ default)
  percentile  — running max of per-batch |x| quantiles (clips outliers)
  mse         — grid-search the clip ratio minimizing int8 quantization MSE
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp

from dlq_tpu.quant.qconfig import QConfig

Stats = Dict[str, jnp.ndarray]

_MSE_GRID = jnp.linspace(0.3, 1.0, 15)


def _batch_stat(x: jnp.ndarray, method: str, percentile: float) -> jnp.ndarray:
    a = jnp.abs(x.astype(jnp.float32)).ravel()
    if method == "minmax":
        return jnp.max(a)
    if method == "percentile":
        return jnp.quantile(a, percentile / 100.0)
    if method == "mse":
        amax = jnp.max(a)

        def err(ratio):
            clip = ratio * amax
            s = jnp.maximum(clip / 127.0, 1e-12)
            q = jnp.clip(jnp.round(a / s), -127, 127) * s
            return jnp.mean((q - a) ** 2)

        errs = jax.vmap(err)(_MSE_GRID)
        return _MSE_GRID[jnp.argmin(errs)] * amax
    raise ValueError(f"unknown calibration method {method}")


def make_collector(
    sites_fn: Callable[..., Dict[str, jnp.ndarray]],
    qcfg: QConfig,
):
    """Wrap a sites_fn (params, x) -> {site: activation} into a jitted
    per-batch stat collector (params, x) -> {site: stat}."""

    def collect_batch(params, x) -> Stats:
        sites = sites_fn(params, x)
        return {
            name: _batch_stat(act, qcfg.calibration, qcfg.percentile)
            for name, act in sites.items()
        }

    return jax.jit(collect_batch)


def merge_stats(running: Optional[Stats], batch: Stats, method: str) -> Stats:
    if running is None:
        return dict(batch)
    out = {}
    for k, v in batch.items():
        prev = running[k]
        # percentile/mse: running max is still the right combiner — it keeps
        # the largest clip any batch wanted, which only loosens clipping.
        out[k] = jnp.maximum(prev, v)
    return out


def calibrate(
    sites_fn: Callable[..., Dict[str, jnp.ndarray]],
    params,
    batches: Iterable[jnp.ndarray],
    qcfg: QConfig,
) -> Dict[str, jnp.ndarray]:
    """Run the calibration set through the model, return {site: act_scale}."""
    collector = make_collector(sites_fn, qcfg)
    running: Optional[Stats] = None
    n = 0
    for x in batches:
        running = merge_stats(running, collector(params, x), qcfg.calibration)
        n += 1
    if not n:
        raise ValueError("empty calibration set")
    assert running is not None
    qmax = qcfg.acts.qmax if qcfg.acts is not None else 127
    return {k: jnp.maximum(v / qmax, 1e-12) for k, v in running.items()}

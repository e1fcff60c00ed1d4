"""Multi-device scaling-efficiency harness.

BASELINE target: >= 85% throughput scaling efficiency from 1 chip to a
multi-host v5e slice. The harness measures batch-sharded (dp) — optionally
tensor-parallel — quantized inference throughput at 1 device and at N
devices on the current mesh, with slope timing:

    efficiency(N) = ips(N) / (N * ips(1))

On real pods run one process per host (`parallel.mesh.init_distributed`);
in tests/dryruns it runs on the virtual CPU mesh, validating the sharding
and collective structure if not the silicon.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.parallel.mesh import MeshConfig, make_mesh
from dlq_tpu.parallel.shard import replicate, shard_batch, shard_params_tp
from dlq_tpu.timing import device_time_fn


def measure_scaling(
    forward: Callable[[Any, jnp.ndarray], jnp.ndarray],
    params: Any,
    input_shape,
    per_device_batch: int = 32,
    device_counts: Optional[List[int]] = None,
    model_parallel: int = 1,
    iters: int = 8,
    dtype=jnp.float32,
) -> Dict[str, Any]:
    """Weak-scaling sweep: batch = per_device_batch * n for each n."""
    all_devices = jax.devices()
    counts = device_counts or sorted({1, 2, len(all_devices)})
    counts = [c for c in counts if c <= len(all_devices) and c % model_parallel == 0 or c == 1]
    rng = np.random.default_rng(0)
    results = []
    for n in counts:
        mp = model_parallel if n % model_parallel == 0 and n >= model_parallel else 1
        mesh = make_mesh(MeshConfig(data=n // mp, model=mp), devices=all_devices[:n])
        p = shard_params_tp(params, mesh) if mp > 1 else replicate(params, mesh)
        batch = per_device_batch * (n // mp)
        x = shard_batch(jnp.asarray(rng.normal(0, 1, (batch,) + tuple(input_shape)), dtype), mesh)
        fn = jax.jit(forward)
        r = device_time_fn(fn, p, x, perturb_arg=1, n_small=2, n_big=2 + iters)
        ips = batch / (r["ms_median"] / 1e3)
        results.append({"devices": n, "model_parallel": mp, "batch": batch,
                        "ms_per_batch": r["ms_median"], "img_per_s": ips})
    base = results[0]["img_per_s"] / results[0]["devices"]
    for r in results:
        r["efficiency"] = r["img_per_s"] / (r["devices"] * base)
    return {"points": results, "per_device_batch": per_device_batch,
            "platform": jax.default_backend()}

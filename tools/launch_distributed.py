#!/usr/bin/env python
"""Multi-host launcher / per-host worker for v5e pod slices.

On a real pod each host runs this as its per-host process (GCE metadata or
explicit flags provide coordinator/process ids); it initializes
`jax.distributed`, builds the global (data, model) mesh spanning all hosts'
chips, loads the quantized store, and serves its shard of every batch
(per-host input feeding, SURVEY §2.7 plan).

Single-host it degrades to the local mesh — so the same entry point runs
everywhere:

  # host 0..N-1, one process per host:
  JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=N JAX_PROCESS_ID=i \
      python tools/launch_distributed.py --qmanifest exports/r18_int8 \
          --model_parallel 2 --steps 50 --per_host_batch 256
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--qmanifest", required=True)
    ap.add_argument("--manifest", default=None, help="fp32 store for model config")
    ap.add_argument("--model_parallel", type=int, default=1)
    ap.add_argument("--per_host_batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--size", type=int, default=224)
    args = ap.parse_args()

    import jax

    from dlq_tpu.parallel.mesh import MeshConfig, init_distributed, make_mesh
    init_distributed()  # no-op without JAX_COORDINATOR_ADDRESS

    import jax.numpy as jnp

    from dlq_tpu.quant.model_quant import DeployCtx
    from dlq_tpu.quant.store import load_quantized
    from dlq_tpu.parallel.shard import shard_batch, shard_params_tp, replicate
    from dlq_tpu.timing import device_time_fn

    qflat, act_scales, qcfg, _ = load_quantized(args.qmanifest)
    # model family from the source manifest's recorded config
    from dlq_tpu.manifest import Manifest

    qman = Manifest.load(args.qmanifest)
    model = qman.model
    mcfg = qman.meta.get("config", {})
    if model.startswith("resnet"):
        from dlq_tpu.models.resnet import ResNetConfig, qforward

        cfg = ResNetConfig(depth=int(model[6:]),
                           num_classes=mcfg.get("num_classes", 1000),
                           small_input=bool(mcfg.get("small_input", False)))
    else:
        raise SystemExit(f"launcher currently serves resnet stores, got {model}")

    n_proc = jax.process_count()
    mesh = make_mesh(MeshConfig(data=-1, model=args.model_parallel))
    payload = {"qflat": qflat, "scales": act_scales}
    payload = (shard_params_tp(payload, mesh) if args.model_parallel > 1
               else replicate(payload, mesh))

    global_batch = args.per_host_batch * n_proc

    def fwd(p, xb):
        return qforward(DeployCtx(p["qflat"], p["scales"], qcfg), xb, cfg)

    fn = jax.jit(fwd)
    size = 32 if cfg.small_input else args.size
    # per-host input feeding: each process materializes only its local shard
    local = np.random.default_rng(jax.process_index()).normal(
        0, 1, (args.per_host_batch, size, size, 3)).astype(np.float32)
    if n_proc > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        x = jax.make_array_from_process_local_data(
            NamedSharding(mesh, P("data")), local,
            (global_batch, size, size, 3))
    else:
        x = shard_batch(jnp.asarray(local), mesh)

    r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2, n_big=2 + args.steps)
    ips = global_batch / (r["ms_median"] / 1e3)
    if jax.process_index() == 0:
        print(json.dumps({
            "hosts": n_proc,
            "devices": len(jax.devices()),
            "mesh": dict(mesh.shape),
            "global_batch": global_batch,
            "ms_per_batch": round(r["ms_median"], 3),
            "img_per_s": round(ips, 1),
            "img_per_s_per_chip": round(ips / len(jax.devices()), 1),
        }))


if __name__ == "__main__":
    main()

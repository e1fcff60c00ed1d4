#!/usr/bin/env python
"""Run the engine against golden fixtures; per-stage diff table + exit code.

The reference's step2..step8 validation binaries (SURVEY §2.2) collapsed
into one tool: load manifest weights, run the jitted engine with taps, diff
every stage vs fixtures at the max_abs gate, print the per-stage table, exit
0 on pass / 2 on numeric failure (the reference's exit-code contract,
infer_conv1_bn1_relu.cu:149-156).

Usage:
  python tools/run_parity.py --manifest exports/resnet18 [--atol 1e-4] [--stage stem]
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
    ap.add_argument("--manifest", required=True)
    ap.add_argument("--atol", type=float, default=1e-4)
    ap.add_argument("--stage", default=None, help="only validate one stage")
    args = ap.parse_args()

    import jax

    from dlq_tpu import numerics
    from dlq_tpu.interop.manifest_io import load_params
    from dlq_tpu.manifest import Manifest
    from dlq_tpu.models import get_model

    man = Manifest.load(args.manifest)
    mcfg = man.meta.get("config", {})
    kw = {}
    if "num_classes" in mcfg:
        kw["num_classes"] = mcfg["num_classes"]
    if mcfg.get("small_input") and man.model.startswith(("resnet", "mobilenet")):
        kw["small_input"] = True
    cfg, init, forward = get_model(man.model, **kw) if man.model != "mlp" else get_model(man.model)
    params = load_params(args.manifest, init(jax.random.PRNGKey(0), cfg))

    fdir = os.path.join(args.manifest, "fixtures")
    with open(os.path.join(fdir, "fixtures.json")) as f:
        index = json.load(f)
    x = np.fromfile(os.path.join(fdir, index["input"]["path"]), np.float32).reshape(
        index["input"]["shape"]
    )

    out = jax.jit(lambda p, xx: forward(p, xx, cfg, taps=True))(params, jnp_x := jax.numpy.asarray(x))
    if isinstance(out, tuple):
        _, taps = out
    else:
        taps = {"logits": out}

    report = numerics.StageReport()
    failed = []
    for stage, meta in index["stages"].items():
        if args.stage and stage != args.stage:
            continue
        golden = np.fromfile(os.path.join(fdir, meta["path"]), np.float32).reshape(meta["shape"])
        got = np.asarray(taps[stage])
        d = report.add(stage, got, golden)
        status = "OK" if d.max_abs <= args.atol else "FAIL"
        if status == "FAIL":
            failed.append(stage)
        print(f"[{status}] {stage:<10} {d}")
    if failed:
        print(f"[FAIL] stages over atol={args.atol:g}: {failed} (worst: {report.worst()})")
        sys.exit(2)
    print(f"[OK] all stages within atol={args.atol:g}")


if __name__ == "__main__":
    main()

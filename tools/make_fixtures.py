#!/usr/bin/env python
"""Generate golden fixtures from the torch oracle for a manifest weight store.

The reference's make_step*_fixture.py family (SURVEY §2.3) as ONE tool:
loads the exported weights, runs the independently-written torch model, and
dumps input + every stage checkpoint as raw fp32 .bin under
<manifest>/fixtures/ — consumed by tools/run_parity.py and the pytest ladder.

Usage:
  python tools/make_fixtures.py --manifest exports/resnet18 [--batch 2] [--seed 7]
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
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--size", type=int, default=0, help="input side (0 = infer from model)")
    args = ap.parse_args()

    import jax

    from dlq_tpu.interop.manifest_io import load_params
    from dlq_tpu.interop.torch_oracle import torch_mlp_logits, torch_resnet_taps
    from dlq_tpu.manifest import Manifest
    from dlq_tpu.models import get_model

    man = Manifest.load(args.manifest)
    model = man.model
    mcfg = man.meta.get("config", {})
    kw = {}
    if "num_classes" in mcfg:
        kw["num_classes"] = mcfg["num_classes"]
    if mcfg.get("small_input") and model.startswith(("resnet", "mobilenet")):
        kw["small_input"] = True
    cfg, init, _ = get_model(model, **kw) if model != "mlp" else get_model(model)
    template = init(jax.random.PRNGKey(0), cfg)
    params = load_params(args.manifest, template)

    rng = np.random.default_rng(args.seed)
    fdir = os.path.join(args.manifest, "fixtures")
    os.makedirs(fdir, exist_ok=True)

    if model == "mlp":
        x = rng.normal(0, 1, (args.batch, cfg.in_dim)).astype(np.float32)
        goldens = {"logits": torch_mlp_logits(params, x)}
    elif model.startswith("resnet"):
        size = args.size or (32 if getattr(cfg, "small_input", False) else 224)
        x = rng.normal(0, 1, (args.batch, size, size, 3)).astype(np.float32)
        goldens = torch_resnet_taps(params, cfg, x)
    else:
        raise SystemExit(f"no torch oracle for {model} yet (resnet/mlp supported)")

    x.tofile(os.path.join(fdir, "input.bin"))
    index = {"input": {"shape": list(x.shape), "path": "input.bin"}, "stages": {}}
    for name, arr in goldens.items():
        rel = f"{name}.bin"
        np.ascontiguousarray(arr, np.float32).tofile(os.path.join(fdir, rel))
        index["stages"][name] = {"shape": list(arr.shape), "path": rel}
    with open(os.path.join(fdir, "fixtures.json"), "w") as f:
        json.dump(index, f, indent=1)
    print(f"[OK] {len(goldens)} stage goldens -> {fdir}")


if __name__ == "__main__":
    main()

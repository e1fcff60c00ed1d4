"""REAL handwritten-digit data for the training ladder.

The reference's MNIST data contract is raw ``.bin`` files of 784-dim
normalized fp32 images (`CUDA/MNIST_on_GPU/v1.py:21-24`, `v3.c:98-105`).
MNIST itself is not downloadable in this environment (zero egress), but
scikit-learn bundles the UCI ML handwritten-digits test set — 1,797 REAL
scanned 8x8 digit images (a resampled slice of the same NIST corpus MNIST
came from). This module upsamples them to the 28x28/784-dim MNIST contract
so every ladder rung (numpy / jax / torch / C++) and the .bin interchange
run on non-synthetic data at least once in CI (VERDICT r1 item #10).
"""

from __future__ import annotations

import os
from typing import Tuple

import numpy as np

MNIST_MEAN, MNIST_STD = 0.1307, 0.3081


def load_real_digits(
    n_train: int = 1200,
    n_test: int = 400,
    seed: int = 0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(Xtr, Ytr, Xte, Yte): real digits at the MNIST data contract —
    flattened 784-dim fp32, mean/std-normalized like every ladder rung."""
    from sklearn.datasets import load_digits

    d = load_digits()
    imgs = d.images.astype(np.float32) * (255.0 / 16.0)  # [N, 8, 8] 0..255
    # 8x8 -> 28x28: integer 3x upsample to 24, then 2px zero border (the
    # MNIST digits sit centered in a margin; bilinear would blur strokes)
    up = np.repeat(np.repeat(imgs, 3, axis=1), 3, axis=2)  # [N, 24, 24]
    big = np.zeros((imgs.shape[0], 28, 28), np.float32)
    big[:, 2:26, 2:26] = up
    X = (big.reshape(len(big), 784) / 255.0 - MNIST_MEAN) / MNIST_STD
    Y = d.target.astype(np.int32)
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(X))
    X, Y = X[order], Y[order]
    n_train = min(n_train, len(X) - n_test)
    return (X[:n_train], Y[:n_train],
            X[n_train:n_train + n_test], Y[n_train:n_train + n_test])


def write_mnist_bins(data_dir: str, Xtr, Ytr, Xte, Yte) -> None:
    """Persist in the reference's exact .bin layout
    (data/{X_train,X_test}.bin fp32 + {y_train,y_test}.bin int32)."""
    from dlq_tpu.data.mnist import save_mnist_bin

    save_mnist_bin(data_dir, Xtr, Ytr, "train")
    save_mnist_bin(data_dir, Xte, Yte, "test")

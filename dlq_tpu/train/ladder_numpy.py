"""Pure-NumPy MNIST MLP training — the ladder's "v2" rung.

Manual forward/backward with the same math the reference hand-derives
(`CUDA/MNIST_on_GPU/v2.py:37-53,119-123`): linear backward as three matmuls
(dX = dY Wᵀ, dW = Xᵀ dY, db = Σ dY) and the fused softmax-CE gradient
(p - onehot)/B. Same init/hypers as every other rung so curves align.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Tuple

import numpy as np


def init_params(seed: int, dims=(784, 256, 10)) -> Dict[str, Any]:
    """He-uniform via the SAME jax PRNG stream as the jax rungs, so v2/v4/v5
    start from literally identical weights (tighter than the reference,
    which only matched the init *scheme* across rungs)."""
    import jax

    from dlq_tpu.models.mlp import MLPConfig, init_mlp

    cfg = MLPConfig(in_dim=dims[0], hidden=tuple(dims[1:-1]), num_classes=dims[-1])
    p = init_mlp(jax.random.PRNGKey(seed), cfg)
    return {
        "W": [np.array(l["w"], np.float32) for l in p["layers"]],  # writable copies
        "b": [np.array(l["b"], np.float32) for l in p["layers"]],
    }


def forward(params, X):
    """Returns (logits, cache of pre/post activations for backward)."""
    acts = [X]
    h = X
    n = len(params["W"])
    pre = []
    for i, (W, b) in enumerate(zip(params["W"], params["b"])):
        z = h @ W + b
        pre.append(z)
        h = np.maximum(z, 0) if i < n - 1 else z
        acts.append(h)
    return h, (acts, pre)


def softmax_ce(logits, y) -> Tuple[float, np.ndarray]:
    """Loss and fused grad (p - onehot)/B."""
    z = logits - logits.max(axis=1, keepdims=True)
    e = np.exp(z)
    p = e / e.sum(axis=1, keepdims=True)
    B = len(y)
    loss = float(-np.log(p[np.arange(B), y] + 1e-12).mean())
    g = p.copy()
    g[np.arange(B), y] -= 1.0
    return loss, g / B


def backward(params, cache, dlogits):
    acts, pre = cache
    n = len(params["W"])
    grads = {"W": [None] * n, "b": [None] * n}
    dy = dlogits
    for i in reversed(range(n)):
        grads["W"][i] = acts[i].T @ dy
        grads["b"][i] = dy.sum(axis=0)
        if i > 0:
            dx = dy @ params["W"][i].T
            dy = dx * (pre[i - 1] > 0)  # relu backward
    return grads


def sgd_update(params, grads, lr):
    for i in range(len(params["W"])):
        params["W"][i] -= lr * grads["W"][i]
        params["b"][i] -= lr * grads["b"][i]


def train_numpy(X, Y, lr=0.01, batch=8, epochs=10, seed=0) -> Tuple[Dict, Dict]:
    params = init_params(seed, (X.shape[1], 256, 10))
    phases = {"data": 0.0, "forward": 0.0, "loss": 0.0, "backward": 0.0, "update": 0.0}
    history = []
    steps = len(X) // batch
    t_all = time.perf_counter()
    for epoch in range(epochs):
        ep_loss = 0.0
        for s in range(steps):
            t0 = time.perf_counter()
            xb = X[s * batch : (s + 1) * batch]
            yb = Y[s * batch : (s + 1) * batch]
            t1 = time.perf_counter(); phases["data"] += t1 - t0
            logits, cache = forward(params, xb)
            t2 = time.perf_counter(); phases["forward"] += t2 - t1
            loss, dlogits = softmax_ce(logits, yb)
            t3 = time.perf_counter(); phases["loss"] += t3 - t2
            grads = backward(params, cache, dlogits)
            t4 = time.perf_counter(); phases["backward"] += t4 - t3
            sgd_update(params, grads, lr)
            phases["update"] += time.perf_counter() - t4
            ep_loss += loss
        history.append({"epoch": epoch, "loss": ep_loss / steps})
    report = {
        "total_s": time.perf_counter() - t_all,
        "phases_s": phases,
        "history": history,
        "final_loss": history[-1]["loss"],
    }
    return params, report


def eval_accuracy(params, X, Y, batch=256) -> float:
    accs = []
    for i in range(0, len(X), batch):
        logits, _ = forward(params, X[i : i + batch])
        accs.append(float((logits.argmax(1) == Y[i : i + batch]).mean()))
    return float(np.mean(accs))

"""Generic supervised training for any zoo model (fused jitted step).

The MNIST ladder trains the MLP; this generalizes the same fused-step
design (loss never leaves the device) to any (params, forward) pair — used
to produce *trained* models for meaningful quantization-accuracy gates
(Δtop-1 on a learned classifier rather than random weights).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


def make_train_step(forward: Callable, lr: float = 0.05, momentum: float = 0.9):
    """SGD+momentum fused step for `forward(params, x) -> logits`."""

    @jax.jit
    def step(params, vel, x, y):
        def loss_fn(p):
            logits = forward(p, x)
            return softmax_ce(logits, y), logits

        (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        vel = jax.tree_util.tree_map(lambda v, g: momentum * v - lr * g, vel, grads)
        params = jax.tree_util.tree_map(lambda p, v: p + v, params, vel)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, vel, loss, acc

    return step


def train(
    forward: Callable,
    params: Any,
    X: np.ndarray,
    Y: np.ndarray,
    epochs: int = 5,
    batch: int = 64,
    lr: float = 0.05,
    momentum: float = 0.9,
    log_every: int = 0,
) -> Tuple[Any, Dict[str, Any]]:
    step = make_train_step(forward, lr, momentum)
    vel = jax.tree_util.tree_map(jnp.zeros_like, params)
    n = (len(X) // batch) * batch
    history = []
    rng = np.random.default_rng(0)
    for ep in range(epochs):
        order = rng.permutation(n)
        ep_loss = ep_acc = 0.0
        steps = 0
        for i in range(0, n, batch):
            idx = order[i : i + batch]
            params, vel, loss, acc = step(params, vel, jnp.asarray(X[idx]), jnp.asarray(Y[idx]))
            ep_loss += float(loss)
            ep_acc += float(acc)
            steps += 1
        history.append({"epoch": ep, "loss": ep_loss / steps, "acc": ep_acc / steps})
        if log_every and ep % log_every == 0:
            print(f"epoch {ep}: loss {history[-1]['loss']:.4f} acc {history[-1]['acc']:.3f}")
    return params, {"history": history, "final": history[-1]}


def evaluate(forward: Callable, params: Any, X, Y, batch: int = 256) -> float:
    fwd = jax.jit(forward)
    correct = total = 0
    n = (len(X) // batch) * batch or len(X)
    for i in range(0, n, batch):
        logits = np.asarray(fwd(params, jnp.asarray(X[i : i + batch])))
        correct += int((logits.argmax(-1) == Y[i : i + batch][: len(logits)]).sum())
        total += len(logits)
    return correct / total

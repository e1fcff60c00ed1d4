"""Generic supervised training for any zoo model (fused jitted step).

The MNIST ladder trains the MLP; this generalizes the same fused-step
design (loss never leaves the device) to any (params, forward) pair — used
to produce *trained* models for meaningful quantization-accuracy gates
(Δtop-1 on a learned classifier rather than random weights).

Optimizers: SGD+momentum (the ladder contract) and Adam (ViT-from-scratch
needs it). LR schedule: constant or cosine with linear warmup — the lr is a
step ARGUMENT, not closed over, so one compiled step serves the whole
schedule. Stateful forwards (training-mode BatchNorm) pass
`forward_train(params, x) -> (logits, aux)` + `apply_state(params, aux, n)
-> params`; the aux path carries batch statistics around the gradient.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def softmax_ce(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


def cosine_lr(base_lr: float, total_steps: int, warmup_frac: float = 0.05):
    """Linear warmup then cosine decay to ~0 — the standard from-scratch
    recipe (a constant lr is what collapsed the round-2 study's resnet)."""
    warm = max(1, int(total_steps * warmup_frac))

    def lr_at(step: int) -> float:
        if step < warm:
            return base_lr * (step + 1) / warm
        t = (step - warm) / max(1, total_steps - warm)
        return base_lr * 0.5 * (1.0 + float(np.cos(np.pi * t)))

    return lr_at


def make_train_step(forward: Callable, lr: float = 0.05, momentum: float = 0.9):
    """SGD+momentum fused step for `forward(params, x) -> logits`.

    Kept for the ladder/QAT callers; `train` below uses the schedule-aware
    stateful step.
    """

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


def _make_step(forward: Callable, opt: str, momentum: float,
               forward_train: Optional[Callable],
               apply_state: Optional[Callable], batch: int,
               weight_decay: float = 0.0):
    """One jitted step: grads + optimizer update (+ BN running-stat update).
    lr arrives as an argument so cosine schedules reuse the compile.
    weight_decay is DECOUPLED (AdamW-style p *= 1 - lr*wd after the update)
    and applies only to ndim>=2 leaves — conv/dense weights — never to
    biases or BN affines/running stats (the standard no-decay set)."""
    fwd_t = forward_train if forward_train is not None else (
        lambda p, x: (forward(p, x), None))

    @jax.jit
    def step(params, opt_state, x, y, lr, t):
        def loss_fn(p):
            logits, aux = fwd_t(p, x)
            return softmax_ce(logits, y), (logits, aux)

        (loss, (logits, aux)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        if opt == "adam":
            m, v = opt_state
            b1, b2, eps = 0.9, 0.999, 1e-8
            m = jax.tree_util.tree_map(lambda a, g: b1 * a + (1 - b1) * g, m, grads)
            v = jax.tree_util.tree_map(lambda a, g: b2 * a + (1 - b2) * g * g, v, grads)
            c1 = 1 - b1 ** (t + 1)
            c2 = 1 - b2 ** (t + 1)
            params = jax.tree_util.tree_map(
                lambda p, mm, vv: p - lr * (mm / c1) / (jnp.sqrt(vv / c2) + eps),
                params, m, v)
            opt_state = (m, v)
        else:
            vel = jax.tree_util.tree_map(
                lambda vv, g: momentum * vv - lr * g, opt_state, grads)
            params = jax.tree_util.tree_map(lambda p, vv: p + vv, params, vel)
            opt_state = vel
        if weight_decay:
            params = jax.tree_util.tree_map(
                lambda p: p * (1.0 - lr * weight_decay) if p.ndim >= 2 else p,
                params)
        if aux is not None and apply_state is not None:
            params = apply_state(params, aux, batch)
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return params, opt_state, loss, acc

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
    opt: str = "sgd",
    schedule: Optional[str] = None,
    warmup_frac: float = 0.05,
    forward_train: Optional[Callable] = None,
    apply_state: Optional[Callable] = None,
    weight_decay: float = 0.0,
) -> Tuple[Any, Dict[str, Any]]:
    n = (len(X) // batch) * batch
    steps_per_epoch = max(1, n // batch)
    total = steps_per_epoch * epochs
    lr_at = cosine_lr(lr, total, warmup_frac) if schedule == "cosine" else (lambda t: lr)
    step = _make_step(forward, opt, momentum, forward_train, apply_state, batch,
                      weight_decay=weight_decay)
    if opt == "adam":
        opt_state = (jax.tree_util.tree_map(jnp.zeros_like, params),
                     jax.tree_util.tree_map(jnp.zeros_like, params))
    else:
        opt_state = jax.tree_util.tree_map(jnp.zeros_like, params)
    history = []
    rng = np.random.default_rng(0)
    t = 0
    for ep in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n, batch):
            idx = order[i : i + batch]
            params, opt_state, loss, acc = step(
                params, opt_state, jnp.asarray(X[idx]), jnp.asarray(Y[idx]),
                jnp.float32(lr_at(t)), jnp.float32(t))  # jnp scalars: no retrace
            # keep device scalars; one sync per EPOCH, not per step (a
            # per-step float() costs a relay round-trip on the TPU tunnel)
            losses.append(loss)
            accs.append(acc)
            t += 1
        steps = len(losses)
        ep_loss = float(np.sum(np.asarray(jax.device_get(losses))))
        ep_acc = float(np.sum(np.asarray(jax.device_get(accs))))
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

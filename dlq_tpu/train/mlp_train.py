"""JAX MNIST MLP training — the top rungs of the training ladder.

Reference contract (identical across v1-v5 so loss curves are comparable,
`CUDA/MNIST_on_GPU/v1.py:50-65`): MLP 784-256-10, He-uniform init, SGD
lr=0.01, batch 8, softmax cross-entropy, per-phase timing breakdown
(data / forward / loss / backward / update).

TPU-first: the whole step — forward, loss, backward, SGD update — is ONE
jitted function (`sgd_train_step`); there is no host round-trip for the loss
(the reference crossed the device boundary twice per step, v5.cu:361-374).
For the ladder's per-phase table we additionally provide `phased_step`,
which runs each phase as its own jitted function with sync points — the
honest TPU analogue of v4's per-kernel cudaDeviceSynchronize timing.
"""

from __future__ import annotations

import dataclasses
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward, softmax_cross_entropy
from dlq_tpu.timing import StageTimer


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 0.01
    batch: int = 8
    epochs: int = 10
    model: MLPConfig = MLPConfig()
    seed: int = 0


def loss_fn(params, x, y, cfg: MLPConfig):
    logits = mlp_forward(params, x, cfg)
    return softmax_cross_entropy(logits, y), logits


def sgd_train_step(params, x, y, lr: float, cfg: MLPConfig):
    """One fused step: grads + SGD update, all on device."""
    (loss, logits), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, x, y, cfg)
    params = jax.tree_util.tree_map(lambda p, g: p - lr * g, params, grads)
    acc = jnp.mean(jnp.argmax(logits, -1) == y)
    return params, loss, acc


def eval_accuracy(params, x, y, cfg: MLPConfig, batch: int = 256) -> float:
    """Mean per-batch accuracy, the reference's eval metric (v1.py:118-140)."""
    accs = []
    fwd = jax.jit(lambda p, xb: mlp_forward(p, xb, cfg))
    for i in range(0, len(x), batch):
        logits = fwd(params, jnp.asarray(x[i : i + batch]))
        accs.append(float(jnp.mean(jnp.argmax(logits, -1) == jnp.asarray(y[i : i + batch]))))
    return float(np.mean(accs))


def train_mlp(
    X: np.ndarray,
    Y: np.ndarray,
    cfg: TrainConfig = TrainConfig(),
    X_test: Optional[np.ndarray] = None,
    Y_test: Optional[np.ndarray] = None,
    phased: bool = False,
) -> Tuple[Any, Dict[str, Any]]:
    """Full training run with the reference's per-phase timing table.

    phased=False (the "v5" mode): one fused jitted step, phases reported as
    data/step. phased=True (the "v4" mode): forward/loss/backward/update
    timed separately with device syncs between — slower, but gives the
    reference's 5-phase breakdown for the ladder comparison.
    """
    params = init_mlp(jax.random.PRNGKey(cfg.seed), cfg.model)
    timer = StageTimer()
    step = jax.jit(sgd_train_step, static_argnums=(4,))

    # phased-mode functions (each separately jitted, v4-style)
    fwd = jax.jit(lambda p, x: mlp_forward(p, x, cfg.model))
    lossf = jax.jit(lambda p, x, y: softmax_cross_entropy(mlp_forward(p, x, cfg.model), y))
    gradf = jax.jit(lambda p, x, y: jax.grad(lambda q: softmax_cross_entropy(mlp_forward(q, x, cfg.model), y))(p))
    updf = jax.jit(lambda p, g: jax.tree_util.tree_map(lambda a, b: a - cfg.lr * b, p, g))

    n = len(X)
    steps_per_epoch = n // cfg.batch
    history = []
    t_start = time.perf_counter()
    for epoch in range(cfg.epochs):
        epoch_loss, epoch_acc = 0.0, 0.0
        for s in range(steps_per_epoch):
            with timer.stage("data"):
                lo = s * cfg.batch
                xb = jnp.asarray(X[lo : lo + cfg.batch])
                yb = jnp.asarray(Y[lo : lo + cfg.batch])
                xb.block_until_ready()
            if phased:
                with timer.stage("forward"):
                    timer.sync(fwd(params, xb))
                with timer.stage("loss"):
                    lv = lossf(params, xb, yb)
                    timer.sync(lv)
                with timer.stage("backward"):
                    grads = gradf(params, xb, yb)
                    timer.sync(grads)
                with timer.stage("update"):
                    params = updf(params, grads)
                    timer.sync(params)
                epoch_loss += float(lv)
            else:
                with timer.stage("step"):
                    params, lv, acc = step(params, xb, yb, cfg.lr, cfg.model)
                    timer.sync(lv)
                epoch_loss += float(lv)
                epoch_acc += float(acc)
        history.append(
            {"epoch": epoch, "loss": epoch_loss / steps_per_epoch, "acc": epoch_acc / steps_per_epoch}
        )
    total_s = time.perf_counter() - t_start

    report: Dict[str, Any] = {
        "total_s": total_s,
        "phases": timer.to_json(),
        "history": history,
        "final_loss": history[-1]["loss"],
    }
    if X_test is not None:
        report["test_acc"] = eval_accuracy(params, X_test, Y_test, cfg.model)
    return params, report

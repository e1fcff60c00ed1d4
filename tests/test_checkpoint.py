"""Training checkpoint/resume tests (atomic swap, exact state round-trip)."""

import os

import jax
import numpy as np

from dlq_tpu.data.mnist import synthetic_mnist
from dlq_tpu.models.mlp import MLPConfig, init_mlp
from dlq_tpu.train.checkpoint import latest_step, load_checkpoint, save_checkpoint
from dlq_tpu.train.mlp_train import TrainConfig, sgd_train_step


def test_roundtrip_exact(tmp_path):
    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    root = str(tmp_path / "ckpt")
    save_checkpoint(root, params, step=7, meta={"lr": 0.01})
    assert latest_step(root) == 7
    p2, step, meta = load_checkpoint(root, init_mlp(jax.random.PRNGKey(1), cfg))
    assert step == 7 and meta["lr"] == 0.01
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_resume_continues_identically(tmp_path):
    """Train 2 steps, checkpoint, train 2 more == training 4 straight."""
    cfg = TrainConfig()
    X, Y = synthetic_mnist(64, seed=0)
    params = init_mlp(jax.random.PRNGKey(0), cfg.model)
    import jax.numpy as jnp

    def steps(p, lo, n):
        for s in range(lo, lo + n):
            xb = jnp.asarray(X[s * 8 : (s + 1) * 8])
            yb = jnp.asarray(Y[s * 8 : (s + 1) * 8])
            p, _, _ = sgd_train_step(p, xb, yb, cfg.lr, cfg.model)
        return p

    straight = steps(params, 0, 4)

    half = steps(params, 0, 2)
    root = str(tmp_path / "c")
    save_checkpoint(root, half, step=2)
    resumed, step, _ = load_checkpoint(root, params)
    final = steps(resumed, step, 2)
    for a, b in zip(jax.tree_util.tree_leaves(straight), jax.tree_util.tree_leaves(final)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_overwrite_is_atomic(tmp_path):
    cfg = MLPConfig()
    root = str(tmp_path / "ckpt")
    p1 = init_mlp(jax.random.PRNGKey(0), cfg)
    p2 = init_mlp(jax.random.PRNGKey(1), cfg)
    save_checkpoint(root, p1, step=1)
    save_checkpoint(root, p2, step=2)
    assert latest_step(root) == 2
    assert not os.path.exists(root + ".tmp")

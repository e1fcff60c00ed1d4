"""MNIST training ladder tests: rungs start from identical weights, follow
the same loss trajectory (the reference's cross-implementation parity
contract, SURVEY §4.6), and actually learn."""

import numpy as np
import pytest

from dlq_tpu.data.mnist import synthetic_mnist
from dlq_tpu.train.ladder_numpy import eval_accuracy as np_eval, train_numpy
from dlq_tpu.train.mlp_train import TrainConfig, eval_accuracy, train_mlp


@pytest.fixture(scope="module")
def data():
    X, Y = synthetic_mnist(n=512, seed=0)
    Xt, Yt = synthetic_mnist(n=256, seed=1)
    return X, Y, Xt, Yt


def test_jax_training_learns(data):
    X, Y, Xt, Yt = data
    cfg = TrainConfig(epochs=3, batch=8)
    params, report = train_mlp(X, Y, cfg, Xt, Yt)
    assert report["history"][0]["loss"] > report["final_loss"]
    assert report["test_acc"] > 0.8  # synthetic task is easy
    assert "step" in report["phases"]["stages_ms"]


def test_phased_mode_reports_five_phases(data):
    X, Y, Xt, Yt = data
    cfg = TrainConfig(epochs=1, batch=8)
    _, report = train_mlp(X[:128], Y[:128], cfg, phased=True)
    stages = report["phases"]["stages_ms"]
    assert set(stages) >= {"data", "forward", "loss", "backward", "update"}


def test_numpy_rung_matches_jax_trajectory(data):
    """v2 (numpy) and v4/v5 (jax) start from identical weights -> nearly
    identical first-epoch loss."""
    X, Y, _, _ = data
    cfg = TrainConfig(epochs=2, batch=8, seed=0)
    _, rep_jax = train_mlp(X[:256], Y[:256], cfg)
    _, rep_np = train_numpy(X[:256], Y[:256], lr=cfg.lr, batch=8, epochs=2, seed=0)
    l_j = rep_jax["history"][0]["loss"]
    l_n = rep_np["history"][0]["loss"]
    assert abs(l_j - l_n) / l_n < 0.02
    # both must descend
    assert rep_np["final_loss"] < l_n


def test_numpy_rung_learns(data):
    X, Y, Xt, Yt = data
    params, _ = train_numpy(X, Y, epochs=3, seed=0)
    assert np_eval(params, Xt, Yt) > 0.8


def test_torch_rung_matches_jax_trajectory(data):
    """v1 (torch) rung from identical weights follows the same curve."""
    from dlq_tpu.interop.torch_oracle import torch_mlp_train

    X, Y, _, _ = data
    cfg = TrainConfig(epochs=1, batch=8, seed=0)
    _, rep_jax = train_mlp(X[:256], Y[:256], cfg)
    rep_t = torch_mlp_train(X[:256], Y[:256], cfg, epochs=1)
    assert abs(rep_jax["history"][0]["loss"] - rep_t["history"][0]["loss"]) < 0.05

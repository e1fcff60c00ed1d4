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


# ---------------- REAL data (VERDICT r1 #10) ----------------

@pytest.fixture(scope="module")
def real_data():
    pytest.importorskip("sklearn")
    from dlq_tpu.data.digits import load_real_digits

    return load_real_digits(n_train=1000, n_test=300, seed=0)


def test_real_digits_bin_contract(real_data, tmp_path):
    """The reference's .bin data contract round-trips REAL digit data."""
    from dlq_tpu.data.digits import write_mnist_bins
    from dlq_tpu.data.mnist import load_mnist_bin

    Xtr, Ytr, Xte, Yte = real_data
    write_mnist_bins(str(tmp_path), Xtr, Ytr, Xte, Yte)
    X2, Y2 = load_mnist_bin(str(tmp_path), "train")
    np.testing.assert_array_equal(X2, Xtr)
    np.testing.assert_array_equal(Y2, Ytr)
    X3, _ = load_mnist_bin(str(tmp_path), "test")
    assert X3.shape == (300, 784)


def test_ladder_on_real_digits(real_data):
    """Cross-rung parity on NON-synthetic data: numpy and jax rungs start
    from identical weights, track the same first-epoch loss, and both
    actually learn real handwritten digits."""
    Xtr, Ytr, Xte, Yte = real_data
    cfg = TrainConfig(epochs=3, batch=8, seed=0)
    params, rep_jax = train_mlp(Xtr, Ytr, cfg, Xte, Yte)
    _, rep_np = train_numpy(Xtr, Ytr, lr=cfg.lr, batch=8, epochs=1, seed=0)
    l_j = rep_jax["history"][0]["loss"]
    l_n = rep_np["history"][0]["loss"]
    assert abs(l_j - l_n) / l_n < 0.02, (l_j, l_n)
    assert rep_jax["test_acc"] > 0.85, rep_jax["test_acc"]


def test_native_rung_on_real_digits(real_data, tmp_path):
    """The C++ rung (native/mlp_train.cc) trains on the same REAL .bin
    files from identical init weights and tracks the same loss curve."""
    from dlq_tpu.train.ladder_native import available, train_native

    if not available():
        pytest.skip("native mlp_train binary not built")
    Xtr, Ytr, _, _ = real_data
    cfg = TrainConfig(epochs=1, batch=8, seed=0)
    _, rep_jax = train_mlp(Xtr[:512], Ytr[:512], cfg)
    _, rep_c = train_native(Xtr[:512], Ytr[:512], str(tmp_path),
                            lr=cfg.lr, batch=8, epochs=1)
    assert abs(rep_jax["history"][0]["loss"] - rep_c["final_loss"]) < 0.1, (
        rep_jax["history"][0]["loss"], rep_c["final_loss"])

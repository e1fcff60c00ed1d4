"""Determinism + fail-fast behavior (SURVEY §5.2/5.3 capability parity).

The reference's 'race detection' was synchronous execution + golden diffs;
XLA's replacement guarantee is run-to-run determinism of compiled programs,
which we assert directly. Fail-fast = validated IO + explicit errors
(reference: CUDA_CHECK exit(1), file-size validation)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.models.resnet import ResNetConfig, init_resnet, resnet_forward


def test_forward_is_deterministic():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    f = jax.jit(lambda p, xx: resnet_forward(p, xx, cfg))
    a = np.asarray(f(params, x))
    b = np.asarray(f(params, x))
    np.testing.assert_array_equal(a, b)


def test_quantized_train_eval_deterministic():
    from dlq_tpu.train.mlp_train import TrainConfig, train_mlp
    from dlq_tpu.data.mnist import synthetic_mnist

    X, Y = synthetic_mnist(256, seed=0)
    cfg = TrainConfig(epochs=1)
    _, rep1 = train_mlp(X, Y, cfg)
    _, rep2 = train_mlp(X, Y, cfg)
    assert rep1["final_loss"] == rep2["final_loss"]


def test_manifest_missing_tensor_fails_fast(tmp_path):
    import jax

    from dlq_tpu.interop.manifest_io import load_params, save_params
    from dlq_tpu.models.mlp import MLPConfig, init_mlp

    cfg = MLPConfig()
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    save_params(str(tmp_path / "m"), "mlp", params)
    import os

    os.remove(tmp_path / "m" / "layers.0.w.bin")
    # manifest.json still lists it -> read fails with a clear error
    with pytest.raises(FileNotFoundError):
        load_params(str(tmp_path / "m"), params)


def test_manifest_shape_mismatch_fails_fast(tmp_path):
    import jax

    from dlq_tpu.interop.manifest_io import load_params, save_params
    from dlq_tpu.models.mlp import MLPConfig, init_mlp

    cfg = MLPConfig()
    save_params(str(tmp_path / "m"), "mlp", init_mlp(jax.random.PRNGKey(0), cfg))
    bigger = init_mlp(jax.random.PRNGKey(0), MLPConfig(hidden=(512,)))
    with pytest.raises(ValueError, match="shape"):
        load_params(str(tmp_path / "m"), bigger)


def test_engine_rejects_oversized_batch():
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward

    cfg = MLPConfig()
    eng = Engine.fp32(mlp_forward, init_mlp(jax.random.PRNGKey(0), cfg), cfg, batch=4)
    with pytest.raises(ValueError, match="batch"):
        eng(np.zeros((5, 784), np.float32))

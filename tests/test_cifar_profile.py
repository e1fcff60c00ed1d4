"""CIFAR-10 data layer + cost-analysis profiling tests."""

import numpy as np

from dlq_tpu.bench.profile import cost_analysis, model_roofline_estimate
from dlq_tpu.data.cifar10 import synthetic_cifar10


def test_synthetic_cifar_learnable_shapes():
    X, Y = synthetic_cifar10(64, seed=0)
    X2, Y2 = synthetic_cifar10(32, seed=1)
    assert X.shape == (64, 32, 32, 3) and Y.shape == (64,)
    # same prototypes across splits (shared task)
    assert not np.array_equal(Y[:32], Y2)


def test_cost_analysis_matmul():
    import jax.numpy as jnp

    x = jnp.ones((256, 512), jnp.float32)
    w = jnp.ones((512, 128), jnp.float32)
    ca = cost_analysis(lambda a, b: a @ b, x, w)
    # 2*M*N*K flops expected
    assert ca.get("flops", 0) >= 2 * 256 * 512 * 128 * 0.9


def test_model_roofline_estimate():
    import jax.numpy as jnp

    x = jnp.ones((512, 512), jnp.float32)
    est = model_roofline_estimate(lambda a: a @ a, x, ms_measured=1.0)
    assert est["flops"] > 0
    assert est["bound"] in ("compute", "memory")
    assert est["roofline_ms"] > 0


def test_synthetic_cifar_alpha_calibration():
    """alpha dials the matched-filter Bayes accuracy: legacy (None) is
    near-separable, alpha=0.08 leaves a real margin (~0.97), alpha=0.02
    is hard (~0.32) — the synthetic_hard study mode depends on this."""
    from dlq_tpu.data.cifar10 import synthetic_cifar10

    protos = np.random.default_rng(7).normal(0, 1, (10, 32 * 32 * 3)).astype(np.float32)

    def matched_filter_acc(alpha):
        X, Y = synthetic_cifar10(4096, seed=3, alpha=alpha)
        F = X.reshape(len(X), -1)
        # scale-invariant matched filter (the data is re-standardized)
        scores = F @ protos.T
        return float((scores.argmax(1) == Y).mean())

    assert matched_filter_acc(None) > 0.99
    a_hard = matched_filter_acc(0.08)
    assert 0.90 < a_hard < 0.995, a_hard
    assert matched_filter_acc(0.02) < 0.6

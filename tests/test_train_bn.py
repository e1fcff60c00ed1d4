"""Training-mode BatchNorm + schedule/optimizer additions (round 3).

The round-2 trained-accuracy study collapsed (7% top-1) because the resnet
trained through inference BN at init stats. These gate the fix at unit
scale: batch-stat normalization matches torch semantics, running stats
actually update, and a short train run LEARNS (loss drops, accuracy above
chance) with the running stats transferring to the inference forward.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.models.common import batchnorm_train, init_bn, update_bn_stats


def test_batchnorm_train_matches_torch_semantics():
    """Batch-stat BN: y = gamma*(x-mu_B)/sqrt(var_B+eps)+beta with BIASED
    batch variance (torch normalizes by N, updates running var by N/(N-1))."""
    rng = np.random.default_rng(0)
    x = rng.normal(1.5, 2.0, (4, 5, 5, 3)).astype(np.float32)
    bn = init_bn(3)
    bn["gamma"] = jnp.asarray([1.0, 2.0, 0.5])
    bn["beta"] = jnp.asarray([0.0, -1.0, 3.0])
    y, (m, v) = batchnorm_train(jnp.asarray(x), bn)
    mu = x.reshape(-1, 3).mean(0)
    var = x.reshape(-1, 3).var(0)  # biased
    ref = (x - mu) / np.sqrt(var + 1e-5) * np.asarray(bn["gamma"]) + np.asarray(bn["beta"])
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)
    np.testing.assert_allclose(np.asarray(m), mu, atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), var, atol=1e-5)
    # running stats EMA (torch momentum convention, unbiased var correction)
    n = x.reshape(-1, 3).shape[0]
    bn2 = update_bn_stats(bn, (m, v), momentum=0.1, n=n)
    np.testing.assert_allclose(np.asarray(bn2["mean"]), 0.1 * mu, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(bn2["var"]), 0.9 * 1.0 + 0.1 * var * n / (n - 1), atol=1e-4)


def test_resnet_bn_training_learns():
    """Short BN-train run on a separable toy task: loss drops, train acc
    above chance, running stats move, and the INFERENCE forward (running
    stats) scores the learned accuracy — the exact transfer the study
    relies on."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, apply_bn_updates, init_resnet, resnet_forward,
        resnet_forward_train,
    )
    from dlq_tpu.train.generic import evaluate, train

    rng = np.random.default_rng(1)
    n, classes = 256, 4
    Y = rng.integers(0, classes, n)
    # class-dependent channel means + noise: trivially separable
    X = rng.normal(0, 0.3, (n, 32, 32, 3)).astype(np.float32)
    for c in range(classes):
        X[Y == c, :, :, c % 3] += 0.8 + 0.3 * c

    cfg = ResNetConfig(depth=18, num_classes=classes, small_input=True,
                       widths=(16, 32, 64, 128))
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    mean0 = np.asarray(params["layer1"][0]["bn1"]["mean"]).copy()

    fwd = lambda p, x: resnet_forward(p, x, cfg)  # noqa: E731
    params, rep = train(
        fwd, params, X, Y, epochs=4, batch=64, lr=0.05, schedule="cosine",
        forward_train=lambda p, x: resnet_forward_train(p, x, cfg),
        apply_state=lambda p, aux, b: apply_bn_updates(p, aux, b))
    hist = rep["history"]
    assert hist[-1]["loss"] < hist[0]["loss"]
    assert hist[-1]["acc"] > 0.5, hist
    # running stats moved away from init
    mean1 = np.asarray(params["layer1"][0]["bn1"]["mean"])
    assert np.abs(mean1 - mean0).max() > 1e-3
    # inference forward (running stats) carries the learned model
    assert evaluate(fwd, params, X, Y) > 0.5


def test_adam_and_cosine_on_mlp():
    from dlq_tpu.models.mlp import MLPConfig, init_mlp, mlp_forward
    from dlq_tpu.train.generic import train

    rng = np.random.default_rng(2)
    X = rng.normal(0, 1, (256, 64)).astype(np.float32)
    W = rng.normal(0, 1, (64, 8)).astype(np.float32)
    Y = (X @ W).argmax(-1)
    cfg = MLPConfig(in_dim=64, hidden=(32,), num_classes=8)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    params, rep = train(lambda p, x: mlp_forward(p, x, cfg), params, X, Y,
                        epochs=10, batch=64, lr=1e-2, opt="adam",
                        schedule="cosine", warmup_frac=0.1)
    hist = rep["history"]
    assert hist[-1]["loss"] < hist[0]["loss"] * 0.8, hist
    assert hist[-1]["acc"] > 0.3, hist


def test_resolve_depthwise_contract():
    from dlq_tpu.ops.qops import resolve_depthwise

    assert resolve_depthwise("stencil") == "stencil"
    assert resolve_depthwise("fp32") == "fp32"
    with pytest.raises(ValueError, match="int8|fp32|stencil"):
        resolve_depthwise("bogus")
    # default resolves via env + canary; on CPU the canary passes -> int8
    assert resolve_depthwise(None) in ("int8", "stencil")


def test_engine_wire_dynamic_raises():
    """wire= with dynamic/simulate must raise, not silently fall back to
    fp32 psum (ADVICE r2)."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.mlp import MLPConfig, init_mlp, qforward
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL

    cfg = MLPConfig(in_dim=32, hidden=(16,), num_classes=4)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    from dlq_tpu.models.mlp import flatten_params

    flat = flatten_params(params)
    with pytest.raises(ValueError, match="wire"):
        Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                         dynamic=True, wire="int8")
    with pytest.raises(ValueError, match="wire"):
        Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                         calib_batches=[jnp.zeros((2, 32))], simulate=True,
                         wire="bf16")


def test_mobilenetv2_bn_training_learns():
    """MNv2 training-mode forward (batch-stat BN) + EMA updates: a few SGD
    steps on a separable toy problem reduce loss, the stats dict covers
    every BN site, and apply_bn_updates moves the running stats (VERDICT r4
    #1 prerequisite — the MNv2 trained-accuracy study trains through this)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, apply_bn_updates, block_meta, init_mobilenetv2,
        mobilenetv2_forward_train,
    )

    cfg = MobileNetV2Config(num_classes=4, small_input=True, width_mult=0.5)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    meta = block_meta(cfg)
    n_bn = 1 + 1 + sum(2 + (1 if m["expand"] else 0) for m in meta)

    rng = np.random.default_rng(0)
    Y = rng.integers(0, 4, 32)
    X = rng.normal(0, 0.1, (32, 32, 32, 3)).astype(np.float32)
    X[np.arange(32), 2, 2, 0] += (Y + 1).astype(np.float32)  # separable mark

    def loss_fn(p, xb, yb):
        logits, stats = mobilenetv2_forward_train(p, xb, cfg)
        lp = jax.nn.log_softmax(logits)
        return -jnp.mean(lp[jnp.arange(len(yb)), yb]), stats

    grad = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    xb, yb = jnp.asarray(X), jnp.asarray(Y)
    (l0, stats), g = grad(params, xb, yb)
    assert len(stats) == n_bn, (len(stats), n_bn)
    mean_before = np.asarray(params["stem"]["bn"]["mean"]).copy()
    params = apply_bn_updates(params, stats, n=32)
    assert not np.allclose(np.asarray(params["stem"]["bn"]["mean"]),
                           mean_before)
    losses = [float(l0)]
    for _ in range(8):
        (l, stats), g = grad(params, xb, yb)
        params = jax.tree_util.tree_map(lambda p, gg: p - 0.05 * gg, params, g)
        params = apply_bn_updates(params, stats, n=32)
        losses.append(float(l))
    # MNv2 at 8 SGD steps moves slowly; a monotone-significant decrease is
    # the signal (the full training convergence gate lives in the study's
    # fp32 >= 0.85 hard gate, not here)
    assert losses[-1] < losses[0] - 0.05, losses

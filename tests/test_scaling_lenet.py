"""Scaling harness + LeNet quantized path tests (virtual CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.bench.scaling import measure_scaling
from dlq_tpu.models.lenet import (
    LeNetConfig, flatten_params, init_lenet, lenet_forward, qforward,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT8_PER_TENSOR


def test_lenet_int8_per_tensor():
    """BASELINE config 1: LeNet-5 on MNIST, per-tensor INT8 PTQ."""
    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(0), cfg)
    flat = flatten_params(params)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (8, 28, 28, 1)), jnp.float32)
    fp32 = np.asarray(lenet_forward(params, x, cfg))
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], INT8_PER_TENSOR)
    qflat = quantize_weights(flat, INT8_PER_TENSOR)
    dep = np.asarray(qforward(DeployCtx(qflat, scales, INT8_PER_TENSOR), x, cfg))
    assert numerics.diff(dep, fp32).cosine > 0.999
    assert numerics.top1_agreement(dep, fp32) == 1.0


def test_lenet_flat_input():
    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(0), cfg)
    flat = flatten_params(params)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 784)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], INT8_PER_TENSOR)
    qflat = quantize_weights(flat, INT8_PER_TENSOR)
    out = qforward(DeployCtx(qflat, scales, INT8_PER_TENSOR), x, cfg)
    assert out.shape == (4, 10)


def test_scaling_harness_structure():
    """Weak-scaling sweep runs on the virtual mesh and reports efficiency;
    CPU 'devices' share cores so we validate structure, not the numbers."""
    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(0), cfg)
    rep = measure_scaling(
        lambda p, x: lenet_forward(p, x, cfg), params, (28, 28, 1),
        per_device_batch=8, device_counts=[1, 8], iters=2,
    )
    assert [p["devices"] for p in rep["points"]] == [1, 8]
    assert rep["points"][0]["efficiency"] == 1.0
    assert rep["points"][1]["batch"] == 64
    assert all(p["img_per_s"] > 0 for p in rep["points"])

"""Full PTQ recipe (smooth -> GPTQ -> bias-correct) composition tests."""

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, INT8_PER_CHANNEL
from dlq_tpu.quant.recipe import ptq_auto
from dlq_tpu.quant.smooth import SmoothDeployCtx


def test_recipe_int4_resnet_beats_plain():
    """The composed recipe must beat plain RTN int4 on e2e output error and
    deploy through SmoothDeployCtx."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        resnet_forward,
    )

    # narrow widths keep the float64 Hessian inversions test-sized
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True,
                       widths=(16, 32, 64, 128))
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    fp32 = np.asarray(resnet_forward(params, x, cfg))
    qcfg = INT4A8_PER_CHANNEL

    scales_p = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)
    plain = np.asarray(qforward(
        DeployCtx(quantize_weights(flat, qcfg), scales_p, qcfg), x, cfg))

    qflat, scales, sm = ptq_auto(qforward, flat, cfg, calib, qcfg)
    dep = np.asarray(qforward(SmoothDeployCtx(qflat, scales, qcfg, sm), x, cfg))

    e_plain = numerics.diff(plain, fp32).rel_l2
    e_recipe = numerics.diff(dep, fp32).rel_l2
    assert e_recipe < e_plain, (e_recipe, e_plain)


def test_recipe_stage_toggles():
    """Every stage can be disabled; smooth='off', gptq=False,
    bias_correct=False reproduces plain calibrate+quantize exactly."""
    from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, qforward

    cfg = MLPConfig(in_dim=64, hidden=(32,), num_classes=10)
    flat = flatten_params(init_mlp(jax.random.PRNGKey(1), cfg))
    rng = np.random.default_rng(1)
    calib = [jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (32, 64)), jnp.float32)
    qcfg = INT8_PER_CHANNEL

    qflat, scales, sm = ptq_auto(qforward, flat, cfg, calib, qcfg,
                                 smooth="off", gptq=False, bias_correct=False)
    assert sm == {}
    ref_scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)
    ref = np.asarray(qforward(
        DeployCtx(quantize_weights(flat, qcfg), ref_scales, qcfg), x, cfg))
    out = np.asarray(qforward(SmoothDeployCtx(qflat, scales, qcfg, sm), x, cfg))
    np.testing.assert_array_equal(out, ref)

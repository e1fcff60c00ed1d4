"""Sensitivity analysis + automatic mixed precision."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
    resnet_forward,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.gptq import collect_hessians
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL
from dlq_tpu.quant.sensitivity import (
    auto_mixed_qconfig, site_sensitivity, suggest_overrides,
)


def _setup():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True,
                       widths=(16, 32, 64, 128))
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)]
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    return cfg, params, flat, calib, x


def test_sensitivity_int8_dominates_int4():
    """int8's expected damage must be below int4's at every site (same
    objective, finer grid)."""
    cfg, params, flat, calib, x = _setup()
    col = collect_hessians(qforward, flat, cfg, calib)
    sens = site_sensitivity(flat, col, INT4A8_PER_CHANNEL)
    assert len(sens) > 15
    for site, s in sens.items():
        assert s["err_hi"] <= s["err_lo"] * 1.001, (site, s)


def test_auto_mixed_precision_improves_within_budget():
    """Promoting the most damage-per-byte sites to int8 must cut e2e error
    vs all-int4 while staying under the byte budget."""
    cfg, params, flat, calib, x = _setup()
    fp32 = np.asarray(resnet_forward(params, x, cfg))
    qcfg = INT4A8_PER_CHANNEL
    col = collect_hessians(qforward, flat, cfg, calib)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)

    q_all4 = quantize_weights(flat, qcfg)
    bytes_all4 = sum(p["qw"].values.size * p["qw"].values.dtype.itemsize
                     for p in q_all4.values())
    budget = int(bytes_all4 * 1.5)  # allow 50% growth over all-int4
    mixed = auto_mixed_qconfig(flat, col, qcfg, budget_bytes=budget)
    assert len(mixed.weight_overrides) >= 1
    q_mix = quantize_weights(flat, mixed)
    bytes_mix = sum(p["qw"].values.size * p["qw"].values.dtype.itemsize
                    for p in q_mix.values())
    assert bytes_mix <= budget

    e4 = numerics.diff(
        np.asarray(qforward(DeployCtx(q_all4, scales, qcfg), x, cfg)), fp32)
    em = numerics.diff(
        np.asarray(qforward(DeployCtx(q_mix, scales, mixed), x, cfg)), fp32)
    assert em.rel_l2 < e4.rel_l2, (em, e4)


def test_suggest_overrides_top_k():
    cfg, params, flat, calib, x = _setup()
    col = collect_hessians(qforward, flat, cfg, calib)
    ov = suggest_overrides(flat, col, INT4A8_PER_CHANNEL, top_k=3)
    assert len(ov) == 3
    assert all(s.bits == 8 for _, s in ov)

"""GPTQ (Hessian-aware rounding): recursion semantics, layer-output error
vs round-to-nearest, and drop-in deployment through the standard contexts."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu import numerics
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.gptq import (
    HessianCollector, collect_hessians, gptq_quantize_weights, gptq_rows,
)
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import QConfig, QScheme


def test_gptq_rows_diagonal_h_is_rtn():
    """With a diagonal Hessian there is no cross-row correlation to exploit:
    GPTQ must reduce exactly to round-to-nearest."""
    rng = np.random.default_rng(0)
    K, O = 32, 8
    W = rng.normal(0, 1, (K, O))
    S = np.maximum(np.abs(W).max(0) / 7.0, 1e-12) * np.ones((K, 1))
    H = np.diag(rng.random(K) + 0.5)
    Q = gptq_rows(W, H, S, -7, 7, damp=0.0, actorder=False)
    rtn = np.clip(np.round(W / S), -7, 7).astype(np.int8)
    np.testing.assert_array_equal(Q, rtn)


def test_gptq_rows_on_grid_identity():
    """Weights already on the grid quantize to themselves (zero error, so no
    propagation happens regardless of H)."""
    rng = np.random.default_rng(1)
    K, O = 16, 4
    q0 = rng.integers(-7, 8, (K, O)).astype(np.float64)
    S = np.full((K, O), 0.1)
    W = q0 * S
    X = rng.normal(0, 1, (64, K))
    Q = gptq_rows(W, X.T @ X, S, -7, 7)
    np.testing.assert_array_equal(Q, q0.astype(np.int8))


@pytest.mark.parametrize("qmax,bits", [(1, 2), (7, 4)])
def test_gptq_beats_rtn_layer_error(qmax, bits):
    """On correlated inputs the whole point: ||X(W - What)|| must drop
    substantially vs round-to-nearest at coarse grids."""
    rng = np.random.default_rng(2)
    K, O = 96, 24
    B = rng.normal(0, 1, (12, K))
    X = rng.normal(0, 1, (512, 12)) @ B + 0.1 * rng.normal(0, 1, (512, K))
    W = rng.normal(0, 1, (K, O))
    S = np.broadcast_to(np.maximum(np.abs(W).max(0) / qmax, 1e-12), (K, O))
    Q = gptq_rows(W, X.T @ X, S, -qmax, qmax)
    err_g = np.linalg.norm(X @ (W - Q * S))
    rtn = np.clip(np.round(W / S), -qmax, qmax)
    err_r = np.linalg.norm(X @ (W - rtn * S))
    assert err_g < 0.8 * err_r, (bits, err_g, err_r)


def test_gptq_model_drop_in():
    """gptq_quantize_weights deploys through the unchanged DeployCtx (same
    QTensor format/scales) and tracks fp32 at least as well as RTN at int4
    on the full ResNet; conv (IHW Hessian ordering), dense, odd-K fallback
    and the grouped-conv RTN fallback all exercise."""
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        resnet_forward,
    )
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    xc = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    fp32 = np.asarray(resnet_forward(params, x, cfg))

    qcfg = INT4A8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [xc], qcfg)
    col = collect_hessians(qforward, flat, cfg, [xc])
    assert "stem" in col.H and "fc" in col.H

    q_rtn = quantize_weights(flat, qcfg)
    q_gptq = gptq_quantize_weights(flat, qcfg, col)
    # format parity: same bits/scales/storage shapes as the RTN baseline
    for site in q_rtn:
        a, b = q_rtn[site]["qw"], q_gptq[site]["qw"]
        assert (a.bits, a.values.shape, a.shape) == (b.bits, b.values.shape, b.shape)
        np.testing.assert_allclose(np.asarray(a.scale), np.asarray(b.scale))

    dep_rtn = np.asarray(qforward(DeployCtx(q_rtn, scales, qcfg), x, cfg))
    dep_gptq = np.asarray(qforward(DeployCtx(q_gptq, scales, qcfg), x, cfg))
    d_rtn = numerics.diff(dep_rtn, fp32)
    d_gptq = numerics.diff(dep_gptq, fp32)
    # GPTQ must not be worse; on a random 18-layer net it is usually better
    assert d_gptq.rel_l2 <= d_rtn.rel_l2 * 1.05, (d_gptq, d_rtn)


def test_gptq_group_wise_weight_only():
    """Group-wise int4 weight-only: group scales repeat over the HWI view,
    GPTQ rows quantize on their group's grid, store-format unchanged."""
    from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, qforward

    cfg = MLPConfig(in_dim=256, hidden=(128,), num_classes=10)
    flat = flatten_params(init_mlp(jax.random.PRNGKey(1), cfg))
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(0, 1, (64, 256)), jnp.float32)
    qcfg = QConfig(weights=QScheme(4, True, -1, group=128), acts=None)
    col = collect_hessians(qforward, flat, cfg, [x])
    q_gptq = gptq_quantize_weights(flat, qcfg, col)
    q_rtn = quantize_weights(flat, qcfg)
    assert q_gptq["fc1"]["qw"].group == 128
    y_g = np.asarray(qforward(DeployCtx(q_gptq, None, qcfg), x, cfg))
    y_r = np.asarray(qforward(DeployCtx(q_rtn, None, qcfg), x, cfg))
    from dlq_tpu.models.mlp import mlp_forward
    ref = np.asarray(mlp_forward(init_mlp(jax.random.PRNGKey(1), cfg), x, cfg))
    assert numerics.diff(y_g, ref).rel_l2 <= numerics.diff(y_r, ref).rel_l2 * 1.05


def test_bias_correction_removes_mean_shift():
    """On a biased input distribution, weight quantization shifts output
    means; the analytic correction must cancel the shift on the calibration
    distribution and lower e2e error on held-out data from it."""
    from dlq_tpu.quant.gptq import bias_correct
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        resnet_forward,
    )

    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(4), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(4)
    mk = lambda n: jnp.asarray(rng.normal(0.5, 1, (n, 32, 32, 3)), jnp.float32)  # noqa: E731
    xc, x = mk(16), mk(16)
    fp32 = np.asarray(resnet_forward(params, x, cfg))
    qcfg = INT4A8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [xc], qcfg)
    col = collect_hessians(qforward, flat, cfg, [xc])
    q0 = quantize_weights(flat, qcfg)
    q1 = bias_correct(flat, q0, col)
    e0 = numerics.diff(np.asarray(qforward(DeployCtx(q0, scales, qcfg), x, cfg)), fp32)
    e1 = numerics.diff(np.asarray(qforward(DeployCtx(q1, scales, qcfg), x, cfg)), fp32)
    assert e1.rel_l2 < e0.rel_l2, (e1, e0)

    # composes with GPTQ
    qg = bias_correct(flat, gptq_quantize_weights(flat, qcfg, col), col)
    eg = numerics.diff(np.asarray(qforward(DeployCtx(qg, scales, qcfg), x, cfg)), fp32)
    assert eg.rel_l2 <= e1.rel_l2 * 1.05

"""SmoothQuant mechanism tests: exactness of the rebalance, and the int8
accuracy win on activation distributions with outlier channels."""

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, mlp_forward, qforward
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
from dlq_tpu.quant.smooth import (
    SmoothDeployCtx, SmoothSimulateCtx, apply_smooth, collect_channel_amax,
    compute_smooth, smooth_calibrate,
)


def _outlier_batch(rng, n, dim, hot, factor=60.0):
    x = rng.normal(0, 1, (n, dim)).astype(np.float32)
    x[:, hot] *= factor  # a few channels dominate the per-tensor amax
    return x


def test_smooth_rebalance_is_exact_fp32():
    """(x/s) @ (s*W) == x @ W in fp32 up to rounding: the transform itself
    changes nothing before quantization."""
    rng = np.random.default_rng(0)
    cfg = MLPConfig(in_dim=64, hidden=(32,), num_classes=8)
    params = init_mlp(jax.random.PRNGKey(0), cfg)
    flat = flatten_params(params)
    x = jnp.asarray(_outlier_batch(rng, 32, 64, hot=[3, 17]), jnp.float32)

    amax = collect_channel_amax(qforward, flat, cfg, [x])
    smooth = compute_smooth(flat, amax)
    assert set(smooth) == set(flat)
    flat_s = apply_smooth(flat, smooth)

    from dlq_tpu.quant.smooth import SmoothObserveCtx

    ref = np.asarray(mlp_forward(params, x, cfg))
    obs = SmoothObserveCtx(flat_s, smooth)
    out = np.asarray(qforward(obs, x, cfg))
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-4)


def test_smooth_improves_outlier_int8():
    """With outlier input channels, smoothed W8A8 must beat plain W8A8
    against the fp32 oracle (the reason SmoothQuant exists)."""
    rng = np.random.default_rng(1)
    cfg = MLPConfig(in_dim=128, hidden=(64,), num_classes=10)
    params = init_mlp(jax.random.PRNGKey(1), cfg)
    flat = flatten_params(params)
    hot = [5, 40, 77]
    calib = [jnp.asarray(_outlier_batch(rng, 64, 128, hot), jnp.float32)]
    x = jnp.asarray(_outlier_batch(rng, 64, 128, hot), jnp.float32)
    fp32 = np.asarray(mlp_forward(params, x, cfg))
    qcfg = INT8_PER_CHANNEL

    # plain W8A8
    scales_p = calibrate(make_sites_fn(qforward, cfg), flat, calib, qcfg)
    q_p = quantize_weights(flat, qcfg)
    plain = np.asarray(qforward(DeployCtx(q_p, scales_p, qcfg), x, cfg))

    # smoothed W8A8
    amax = collect_channel_amax(qforward, flat, cfg, calib)
    smooth = compute_smooth(flat, amax)
    flat_s = apply_smooth(flat, smooth)
    scales_s = smooth_calibrate(qforward, flat_s, cfg, calib, qcfg, smooth)
    q_s = quantize_weights(flat_s, qcfg)
    dep = np.asarray(qforward(SmoothDeployCtx(q_s, scales_s, qcfg, smooth), x, cfg))
    sim = np.asarray(qforward(SmoothSimulateCtx(q_s, scales_s, qcfg, smooth), x, cfg))

    assert numerics.diff(dep, sim).cosine > 0.999  # deploy tracks its oracle
    e_plain = numerics.diff(plain, fp32).rel_l2
    e_smooth = numerics.diff(dep, fp32).rel_l2
    assert e_smooth < 0.7 * e_plain, (e_smooth, e_plain)


def test_smooth_skips_grouped_and_conv_runs():
    """Conv models: smoothing applies to groups==1 sites, skips depthwise
    (I=1 weights), and the deploy path runs end to end."""
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward, mobilenetv2_forward,
    )

    rng = np.random.default_rng(2)
    cfg = MobileNetV2Config(num_classes=10, small_input=True)
    params = init_mobilenetv2(jax.random.PRNGKey(2), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    x = jnp.asarray(rng.normal(0, 1, (2, 32, 32, 3)), jnp.float32)

    amax = collect_channel_amax(qf, flat, cfg, [x])
    smooth = compute_smooth(flat, amax)
    assert not any(".dw" in k for k in smooth)  # depthwise skipped
    assert any(".expand" in k for k in smooth)
    flat_s = apply_smooth(flat, smooth)
    qcfg = INT8_PER_CHANNEL
    scales = smooth_calibrate(qf, flat_s, cfg, [x], qcfg, smooth)
    q_s = quantize_weights(flat_s, qcfg)
    dep = np.asarray(qf(SmoothDeployCtx(q_s, scales, qcfg, smooth), x, cfg))
    ref = np.asarray(mobilenetv2_forward(params, x, cfg))
    assert numerics.diff(dep, ref).cosine > 0.99


def test_search_smooth_alpha_not_worse():
    """The global empirical alpha search (real quantized forward per
    candidate on held-out calibration data) must match or beat both plain
    quantization and the fixed alpha=0.5 recipe on fresh data from the same
    distribution."""
    from dlq_tpu.quant.smooth import search_smooth_alpha

    rng = np.random.default_rng(5)
    cfg = MLPConfig(in_dim=128, hidden=(64,), num_classes=10)
    params = init_mlp(jax.random.PRNGKey(5), cfg)
    flat = flatten_params(params)
    hot = [2, 64, 100]
    calib = [jnp.asarray(_outlier_batch(rng, 64, 128, hot), jnp.float32)
             for _ in range(2)]
    x = jnp.asarray(_outlier_batch(rng, 64, 128, hot), jnp.float32)
    fp32 = np.asarray(mlp_forward(params, x, cfg))
    qcfg = INT8_PER_CHANNEL

    amax = collect_channel_amax(qforward, flat, cfg, calib)

    def run(smooth):
        fs = apply_smooth(flat, smooth)
        sc = smooth_calibrate(qforward, fs, cfg, calib, qcfg, smooth)
        q = quantize_weights(fs, qcfg)
        dep = np.asarray(qforward(SmoothDeployCtx(q, sc, qcfg, smooth), x, cfg))
        return numerics.diff(dep, fp32).rel_l2

    e_plain = run({})
    e_fixed = run(compute_smooth(flat, amax))
    sm, alpha = search_smooth_alpha(qforward, flat, cfg, calib, qcfg)
    e_auto = run(sm)
    # holdout-selected alpha transfers to fresh data (some sampling slack)
    assert e_auto <= e_plain * 1.05 and e_auto <= e_fixed * 1.05, (
        e_plain, e_fixed, e_auto, alpha)


def test_smooth_qat_ctx_trains_and_matches_deploy():
    """SmoothQATCtx: one step trains under the x/s divide; eval through it
    tracks the smoothed integer deploy (parity contract extended)."""
    from dlq_tpu.quant.smooth import SmoothQATCtx

    rng = np.random.default_rng(6)
    cfg = MLPConfig(in_dim=64, hidden=(32,), num_classes=10)
    flat = flatten_params(init_mlp(jax.random.PRNGKey(6), cfg))
    hot = [1, 30]
    calib = [jnp.asarray(_outlier_batch(rng, 32, 64, hot), jnp.float32)]
    x = jnp.asarray(_outlier_batch(rng, 32, 64, hot), jnp.float32)
    qcfg = INT8_PER_CHANNEL

    amax = collect_channel_amax(qforward, flat, cfg, calib)
    smooth = compute_smooth(flat, amax)
    flat_s = apply_smooth(flat, smooth)
    scales = smooth_calibrate(qforward, flat_s, cfg, calib, qcfg, smooth)

    fq = np.asarray(qforward(SmoothQATCtx(flat_s, scales, qcfg, smooth), x, cfg))
    q = quantize_weights(flat_s, qcfg)
    dep = np.asarray(qforward(SmoothDeployCtx(q, scales, qcfg, smooth), x, cfg))
    assert numerics.diff(fq, dep).cosine > 0.999

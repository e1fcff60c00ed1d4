"""End-to-end PTQ pipeline tests: calibration, deploy-vs-simulate parity,
quantized store round-trip, per-layer error report."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu import numerics
from dlq_tpu.models.resnet import (
    ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward, resnet_forward,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.error_report import quant_error_report
from dlq_tpu.quant.model_quant import (
    DeployCtx, ObserveCtx, SimulateCtx, make_sites_fn, quantize_weights,
)
from dlq_tpu.quant.qconfig import (
    INT4_WEIGHT_ONLY_G128, INT8_PER_CHANNEL, INT8_PER_TENSOR, QConfig,
)
from dlq_tpu.quant.store import load_quantized, save_quantized


@pytest.fixture(scope="module")
def setup():
    cfg = ResNetConfig(depth=18, num_classes=10, small_input=True)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    fp32 = np.asarray(resnet_forward(params, x, cfg))
    return cfg, params, flat, x, fp32


def _deploy(flat, cfg, qcfg, x, calib=None):
    scales = None
    if not qcfg.weight_only:
        scales = calibrate(make_sites_fn(qforward, cfg), flat, calib or [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    dep = qforward(DeployCtx(qflat, scales, qcfg), x, cfg)
    return qflat, scales, np.asarray(dep)


def test_int8_per_channel_accuracy(setup):
    cfg, params, flat, x, fp32 = setup
    _, _, dep = _deploy(flat, cfg, INT8_PER_CHANNEL, x)
    assert numerics.diff(dep, fp32).cosine > 0.999
    assert numerics.top1_agreement(dep, fp32) == 1.0


def test_per_channel_beats_per_tensor(setup):
    cfg, params, flat, x, fp32 = setup
    _, _, dep_pc = _deploy(flat, cfg, INT8_PER_CHANNEL, x)
    _, _, dep_pt = _deploy(flat, cfg, INT8_PER_TENSOR, x)
    assert numerics.diff(dep_pc, fp32).rel_l2 <= numerics.diff(dep_pt, fp32).rel_l2 * 1.5


def test_deploy_matches_simulate(setup):
    """The simulated-quant fp32 oracle must track the integer deploy path
    (same quantization decisions; only accumulation order differs)."""
    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    dep = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
    sim = np.asarray(qforward(SimulateCtx(qflat, scales, qcfg), x, cfg))
    assert numerics.diff(dep, sim).cosine > 0.999


def test_deploy_sub8bit_acts_clip(setup):
    """DeployCtx/DynamicDeployCtx must clip activations at the scheme's
    qmax (e.g. ±7 for 4-bit acts), not a hardcoded ±127 — on inputs that
    exceed the calibrated amax the deploy path would otherwise silently
    diverge from SimulateCtx (which fake-quants at ±qmax)."""
    from dlq_tpu.quant.model_quant import DynamicDeployCtx
    from dlq_tpu.quant.qconfig import QScheme

    cfg, params, flat, x, fp32 = setup
    qcfg = QConfig(weights=QScheme(8, True, -1), acts=QScheme(4, True, None))
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    # 3x the calibration range so runtime acts exceed calibrated amax and
    # MUST saturate at ±7 (per-site check: whole-net comparison at 4-bit
    # act steps is dominated by rounding-tie boundary crossings)
    x_hot = x * 3.0
    dc = DeployCtx(qflat, scales, qcfg)
    sc = SimulateCtx(qflat, scales, qcfg)
    y_d = np.asarray(dc.conv("stem", x_hot, stride=1, padding=1, fuse_relu=True))
    y_s = np.asarray(sc.conv("stem", x_hot, stride=1, padding=1, fuse_relu=True))
    assert numerics.diff(y_d, y_s).max_abs < 1e-4
    feat = jnp.asarray(
        np.random.default_rng(1).normal(0, 3, (4, 512)), jnp.float32)
    d_d = np.asarray(dc.dense("fc", feat))
    d_s = np.asarray(sc.dense("fc", feat))
    assert numerics.diff(d_d, d_s).max_abs < 1e-4
    # dynamic scales are per-batch; the same ±qmax bound must apply
    dyn = DynamicDeployCtx(qflat, qcfg)
    yd = np.asarray(dyn.conv("stem", x_hot, stride=1, padding=1))
    assert np.isfinite(yd).all()


def test_int4_weight_only(setup):
    cfg, params, flat, x, fp32 = setup
    _, _, dep = _deploy(flat, cfg, INT4_WEIGHT_ONLY_G128, x)
    assert numerics.diff(dep, fp32).cosine > 0.98


def test_calibration_methods(setup):
    cfg, params, flat, x, fp32 = setup
    for method in ("minmax", "percentile", "mse"):
        qcfg = QConfig(calibration=method)
        scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
        assert all(float(s) > 0 for s in scales.values())
        if method != "minmax":
            # clipping methods can only tighten scales
            mm = calibrate(make_sites_fn(qforward, cfg), flat, [x], QConfig(calibration="minmax"))
            assert all(float(scales[k]) <= float(mm[k]) + 1e-9 for k in scales)


def test_store_roundtrip(setup, tmp_path):
    """save_quantized -> load_quantized -> identical logits (bit-exact
    weights/scales through the manifest)."""
    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    before = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))

    save_quantized(str(tmp_path / "q"), "resnet18", qflat, scales, qcfg)
    qflat2, scales2, qcfg2, _ = load_quantized(str(tmp_path / "q"))
    after = np.asarray(qforward(DeployCtx(qflat2, scales2, qcfg2), x, cfg))
    np.testing.assert_array_equal(before, after)


def test_store_corruption_is_loud(setup, tmp_path):
    """Error injection (VERDICT r3 #7): a damaged quantized store must fail
    with a clear error at load/read time, never deploy garbage."""
    import json
    import os

    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)

    # (a) truncated weight .bin -> size-validation ValueError
    root_a = str(tmp_path / "trunc")
    save_quantized(root_a, "resnet18", qflat, scales, qcfg)
    victim = os.path.join(root_a, "stem.w.bin")
    data = open(victim, "rb").read()
    with open(victim, "wb") as f:
        f.write(data[: len(data) // 2])
    with pytest.raises(ValueError, match="expected"):
        load_quantized(root_a)

    # (b) future manifest version -> refuse, do not guess at the schema
    root_b = str(tmp_path / "future")
    save_quantized(root_b, "resnet18", qflat, scales, qcfg)
    mpath = os.path.join(root_b, "manifest.json")
    doc = json.load(open(mpath))
    doc["version"] = 99
    json.dump(doc, open(mpath, "w"))
    with pytest.raises(ValueError, match="version 99"):
        load_quantized(root_b)

    # (c) plain weight export (no qconfig block) mistaken for a quantized
    # store -> a directed message, not a KeyError
    root_c = str(tmp_path / "plain")
    from dlq_tpu.manifest import Manifest

    m = Manifest(root_c, model="resnet18")
    m.add("stem.w", np.zeros((8, 8), np.float32))
    m.save()
    with pytest.raises(ValueError, match="qconfig"):
        load_quantized(root_c)

    # (d) corrupted scheme field -> loud TypeError/ValueError from QScheme
    root_d = str(tmp_path / "scheme")
    save_quantized(root_d, "resnet18", qflat, scales, qcfg)
    mpath = json.load(open(os.path.join(root_d, "manifest.json")))
    mpath["meta"]["qconfig"]["weights"] = {"nonsense_field": 1}
    json.dump(mpath, open(os.path.join(root_d, "manifest.json"), "w"))
    with pytest.raises(TypeError):
        load_quantized(root_d)


def test_store_roundtrip_int4(setup, tmp_path):
    cfg, params, flat, x, fp32 = setup
    qcfg = INT4_WEIGHT_ONLY_G128
    qflat = quantize_weights(flat, qcfg)
    before = np.asarray(qforward(DeployCtx(qflat, None, qcfg), x, cfg))
    save_quantized(str(tmp_path / "q4"), "resnet18", qflat, None, qcfg)
    qflat2, scales2, qcfg2, _ = load_quantized(str(tmp_path / "q4"))
    assert qcfg2.weight_only
    after = np.asarray(qforward(DeployCtx(qflat2, None, qcfg2), x, cfg))
    np.testing.assert_array_equal(before, after)


def test_quant_error_report(setup, tmp_path):
    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)

    fp32_fn = jax.jit(lambda xx: resnet_forward(params, xx, cfg, taps=True))
    q_fn = jax.jit(lambda xx: qforward(DeployCtx(qflat, scales, qcfg), xx, cfg, taps=True))

    from dlq_tpu.runlog import RunLogger

    logger = RunLogger(root=str(tmp_path / "logs"), script="test_report.py")
    rep = quant_error_report(fp32_fn, q_fn, [x], logger=logger, params_info={"model": "r18"})
    assert rep["top1_agreement"] == 1.0
    assert set(rep["stages"]) >= {"stem", "layer1", "layer4", "logits"}
    assert rep["worst_stage"] is not None
    assert len(logger.rows()) == 1
    assert "m_top1_agreement" in logger.rows()[0]


def test_fused_int8_interchange_bit_exact(setup):
    """FusedDeployCtx (int8 activations between ops, requant in epilogue)
    must be BIT-EXACT vs DeployCtx — same quantize decisions, earlier."""
    from dlq_tpu.models.resnet import qforward_fused
    from dlq_tpu.quant.model_quant import FusedDeployCtx

    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    ref = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
    fused = np.asarray(qforward_fused(FusedDeployCtx(qflat, scales, qcfg), x, cfg))
    np.testing.assert_array_equal(fused, ref)


def test_fused_ctx_taps(setup):
    from dlq_tpu.models.resnet import qforward_fused
    from dlq_tpu.quant.model_quant import FusedDeployCtx

    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    _, taps = qforward_fused(FusedDeployCtx(qflat, scales, qcfg), x, cfg, taps=True)
    assert set(taps) >= {"stem", "layer1", "layer4", "logits"}
    # taps are fp32 (block-boundary interchange), comparable to fp32 taps
    assert all(np.asarray(v).dtype == np.float32 for v in taps.values())


def test_full_fused_ctx_imagenet_shape(setup):
    """FullFusedCtx (fully-int8 interchange, TFLite-style int adds) tracks
    DeployCtx closely and keeps top-1; s2d stem is bit-exact vs plain."""
    from dlq_tpu.models.resnet import qforward_fused2
    from dlq_tpu.quant.model_quant import FullFusedCtx

    cfg = ResNetConfig(depth=18, num_classes=16)
    params = init_resnet(jax.random.PRNGKey(3), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(np.random.default_rng(3).normal(0, 1, (2, 64, 64, 3)), jnp.float32)
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    dep = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
    f_plain = np.asarray(qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg, s2d_stem=False))
    f_s2d = np.asarray(qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg, s2d_stem=True))
    np.testing.assert_array_equal(f_s2d, f_plain)  # s2d rewrite is exact
    assert numerics.diff(f_plain, dep).cosine > 0.998
    assert numerics.top1_agreement(f_plain, dep) == 1.0


def test_full_fused_ctx_taps(setup):
    from dlq_tpu.models.resnet import qforward_fused2
    from dlq_tpu.quant.model_quant import FullFusedCtx

    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    _, taps = qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg, taps=True)
    assert set(taps) >= {"stem", "layer1", "layer4", "logits"}


def test_w4a8_qconv2d_exact():
    """W4A8 conv: the in-graph nibble unpack is exact, so qconv2d with int4
    per-OC weights must match the integer reference computed on the unpacked
    values (same int32 accumulation as W8A8 — only the weight storage is
    4-bit). This is the conv counterpart of the int4a8 dense path."""
    from dlq_tpu.ops.qops import qconv2d
    from dlq_tpu.quant.qconfig import QScheme
    from dlq_tpu.quant.quantize import (
        QTensor, quantize_act, quantize_tensor, unpack_int4,
    )

    rng = np.random.default_rng(7)
    kh = kw = 3
    ci, co = 8, 16
    w = rng.normal(0, 1, (kh, kw, ci, co)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(w.reshape(-1, co)), QScheme(4, True, -1))
    qt.orig_shape = (kh, kw, ci, co)
    x = rng.normal(0, 1, (2, 10, 10, ci)).astype(np.float32)
    act_scale = jnp.float32(np.abs(x).max() / 127.0)
    y = np.asarray(qconv2d(jnp.asarray(x), qt, None, act_scale, stride=1,
                           padding=1))
    # integer reference: quantized acts conv unpacked int8 weights (exact)
    xq = np.asarray(quantize_act(jnp.asarray(x), act_scale)).astype(np.int64)
    w8 = np.asarray(unpack_int4(qt.values, qt.shape)).reshape(kh, kw, ci, co)
    xp = np.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))
    acc = np.zeros((2, 10, 10, co), np.int64)
    for u in range(kh):
        for v in range(kw):
            acc += np.einsum("nhwc,co->nhwo", xp[:, u:u + 10, v:v + 10, :],
                             w8[u, v].astype(np.int64))
    ref = acc.astype(np.float64) * np.asarray(act_scale * qt.scale, np.float64)
    rel = np.abs(y - ref).max() / np.abs(ref).max()
    assert rel < 1e-6


def test_w4a8_resnet_pipeline(setup):
    """INT4A8_PER_CHANNEL through the full ResNet PTQ pipeline: even-K conv
    sites pack to int4 (half the weight bytes of W8A8, same int8 conv rate);
    odd-K sites (the C=3 stem) fall back to int8; the fused fully-int8
    interchange ctx runs the same int4 weights."""
    from dlq_tpu.models.resnet import qforward_fused2
    from dlq_tpu.quant.model_quant import FullFusedCtx
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg, params, flat, x, fp32 = setup
    qcfg = INT4A8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    bits = {site: p["qw"].bits for site, p in qflat.items()}
    assert bits["stem"] == 8  # K = 3*3*3 = 27, odd -> int8 fallback
    assert bits["layer1.0.conv1"] == 4 and bits["fc"] == 4
    assert sum(b == 4 for b in bits.values()) >= 15
    dep = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
    # correctness: integer deploy tracks the fake-quant fp32 oracle (same
    # quantization decisions; only accumulation order differs)
    sim = np.asarray(qforward(SimulateCtx(qflat, scales, qcfg), x, cfg))
    assert numerics.diff(dep, sim).cosine > 0.999
    # accuracy class: int4 per-OC across 18 layers (random weights)
    assert numerics.diff(dep, fp32).cosine > 0.95
    f2 = np.asarray(qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg))
    assert numerics.diff(f2, dep).cosine > 0.99


def test_w4a8_store_roundtrip_engine(setup, tmp_path):
    """W4A8 store round-trip + Engine.from_store cold start on the fused2
    (fully-int8 interchange) path — bit-exact vs the in-process forward."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.models.resnet import qforward_fused2
    from dlq_tpu.quant.model_quant import FullFusedCtx
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg, params, flat, x, fp32 = setup
    qcfg = INT4A8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    before = np.asarray(qforward_fused2(FullFusedCtx(qflat, scales, qcfg), x, cfg))
    save_quantized(str(tmp_path / "q48"), "resnet18", qflat, scales, qcfg,
                   meta={"config": {"num_classes": cfg.num_classes,
                                    "small_input": cfg.small_input}})
    eng = Engine.from_store(str(tmp_path / "q48"), ctx="fused2", batch=x.shape[0])
    after = np.asarray(eng(np.asarray(x)))
    np.testing.assert_array_equal(before, after)


def test_mixed_precision_overrides(setup, tmp_path):
    """Per-site weight schemes (the standard INT4 recipe: int8 stem + fc,
    int4 body): overrides apply by fnmatch, improve accuracy over all-int4,
    and round-trip through the quantized store."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL, QScheme

    cfg, params, flat, x, fp32 = setup
    import dataclasses as dc

    mixed = dc.replace(
        INT4A8_PER_CHANNEL,
        weight_overrides=(("stem", QScheme(8, True, -1)),
                          ("fc", QScheme(8, True, -1)),
                          ("layer1.*", QScheme(8, True, -1))),
    )
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], mixed)
    qflat = quantize_weights(flat, mixed)
    assert qflat["stem"]["qw"].bits == 8
    assert qflat["fc"]["qw"].bits == 8
    assert qflat["layer1.0.conv1"]["qw"].bits == 8
    assert qflat["layer4.0.conv1"]["qw"].bits == 4
    dep_mixed = np.asarray(qforward(DeployCtx(qflat, scales, mixed), x, cfg))

    qflat4 = quantize_weights(flat, INT4A8_PER_CHANNEL)
    dep_all4 = np.asarray(qforward(DeployCtx(qflat4, scales, INT4A8_PER_CHANNEL), x, cfg))
    assert (numerics.diff(dep_mixed, fp32).rel_l2
            <= numerics.diff(dep_all4, fp32).rel_l2)

    save_quantized(str(tmp_path / "qmix"), "resnet18", qflat, scales, mixed,
                   meta={"config": {"num_classes": cfg.num_classes,
                                    "small_input": cfg.small_input}})
    qflat2, scales2, qcfg2, _ = load_quantized(str(tmp_path / "qmix"))
    assert qcfg2.weight_overrides[0][0] == "stem"
    assert qcfg2.scheme_for("stem").bits == 8
    assert qcfg2.scheme_for("layer4.0.conv1").bits == 4
    eng = Engine.from_store(str(tmp_path / "qmix"), batch=x.shape[0])
    np.testing.assert_array_equal(np.asarray(eng(np.asarray(x))), dep_mixed)


def test_w4a8_materialize_int8(setup, tmp_path):
    """int4_runtime='int8': unpack-at-load must be bit-exact vs the packed
    runtime (same integer values, same scales; only HBM residency differs)."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.quant.qconfig import INT4A8_PER_CHANNEL

    cfg, params, flat, x, fp32 = setup
    qcfg = INT4A8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    save_quantized(str(tmp_path / "qm"), "resnet18", qflat, scales, qcfg,
                   meta={"config": {"num_classes": cfg.num_classes,
                                    "small_input": cfg.small_input}})
    e_packed = Engine.from_store(str(tmp_path / "qm"), ctx="fused2", batch=4)
    e_int8 = Engine.from_store(str(tmp_path / "qm"), ctx="fused2", batch=4,
                               int4_runtime="int8")
    a = np.asarray(e_packed(np.asarray(x)))
    b = np.asarray(e_int8(np.asarray(x)))
    np.testing.assert_array_equal(a, b)
    assert all(p["qw"].bits == 8 for p in e_int8.params["qflat"].values())


def test_resnet_deep_variants():
    """ResNet-101/152 (torchvision stage counts) build, register, and run
    the quantized deploy path."""
    from dlq_tpu.models.registry import get_model

    cfg, init, fwd = get_model("resnet101", num_classes=8, small_input=True)
    assert cfg.blocks_per_stage == (3, 4, 23, 3) and cfg.bottleneck
    params = init(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (2, 32, 32, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    dep = np.asarray(qforward(DeployCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    ref = np.asarray(fwd(params, x, cfg))
    assert numerics.diff(dep, ref).cosine > 0.999
    assert get_model("resnet152", num_classes=8)[0].blocks_per_stage == (3, 8, 36, 3)


def test_dynamic_act_quantization(setup):
    """Calibration-free deploy: runtime per-batch scales. Tracks both the
    calibrated deploy and fp32 closely (scales differ slightly after the
    first site: observe-pass inputs are fp32 intermediates, deploy-pass
    inputs are quantized intermediates), and the Engine runs it with no
    calibration data at all."""
    from dlq_tpu.engine import Engine
    from dlq_tpu.quant.model_quant import DynamicDeployCtx

    cfg, params, flat, x, fp32 = setup
    qcfg = INT8_PER_CHANNEL
    scales = calibrate(make_sites_fn(qforward, cfg), flat, [x], qcfg)
    qflat = quantize_weights(flat, qcfg)
    ref = np.asarray(qforward(DeployCtx(qflat, scales, qcfg), x, cfg))
    dyn = np.asarray(qforward(DynamicDeployCtx(qflat, qcfg), x, cfg))
    assert numerics.diff(dyn, ref).cosine > 0.999
    assert numerics.diff(dyn, fp32).cosine > 0.999
    assert numerics.top1_agreement(dyn, fp32) == 1.0

    eng = Engine.quantized(qforward, flat, cfg, qcfg, dynamic=True,
                           batch=x.shape[0])
    # jit fusion reorders fp32 epilogue math vs the op-by-op run
    np.testing.assert_allclose(np.asarray(eng(np.asarray(x))), dyn, atol=1e-5)


def test_dynamic_rejects_weight_only(setup, tmp_path):
    """dynamic act quantization needs an acts scheme: weight-only configs
    must be rejected loudly in Engine.quantized and from_store alike."""
    from dlq_tpu.engine import Engine

    cfg, params, flat, x, fp32 = setup
    with pytest.raises(ValueError, match="weight-only"):
        Engine.quantized(qforward, flat, cfg, INT4_WEIGHT_ONLY_G128,
                         dynamic=True, batch=4)
    with pytest.raises(ValueError, match="dynamic"):
        Engine.quantized(qforward, flat, cfg, INT8_PER_CHANNEL,
                         dynamic=True, simulate=True, batch=4)
    qflat = quantize_weights(flat, INT4_WEIGHT_ONLY_G128)
    save_quantized(str(tmp_path / "wo"), "resnet18", qflat, None,
                   INT4_WEIGHT_ONLY_G128,
                   meta={"config": {"num_classes": cfg.num_classes,
                                    "small_input": cfg.small_input}})
    with pytest.raises(ValueError, match="weight-only"):
        Engine.from_store(str(tmp_path / "wo"), ctx="dynamic", batch=4)

"""ViT INT8 per-layer error harness (BASELINE config 5), feature-map
inspector, and run-logger xlsx export tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu import numerics
from dlq_tpu.inspect_fm import inspect_taps, make_grid, topk_energy_channels
from dlq_tpu.models.vit import (
    ViTConfig, flatten_vit, init_vit, make_qforward, vit_extras, vit_forward,
)
from dlq_tpu.quant.calibrate import calibrate
from dlq_tpu.quant.error_report import quant_error_report
from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
from dlq_tpu.runlog import RunLogger, read_xlsx_rows


def test_vit_int8_per_layer_error_report(tmp_path):
    """Quantized attention projections + per-block error logging — the
    BASELINE config-5 harness."""
    cfg = ViTConfig(image_size=32, patch=4, dim=64, depth=2, heads=2, num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    x = jnp.asarray(np.random.default_rng(0).normal(0, 1, (4, 32, 32, 3)), jnp.float32)
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)

    fp32_fn = jax.jit(lambda xx: vit_forward(params, xx, cfg, taps=True))
    q_fn = jax.jit(lambda xx: qf(DeployCtx(qflat, scales, INT8_PER_CHANNEL), xx, cfg, taps=True))
    logger = RunLogger(root=str(tmp_path / "logs"), script="vit_report.py")
    rep = quant_error_report(fp32_fn, q_fn, [x], logger=logger,
                             params_info={"model": "deit_tiny"})
    assert rep["top1_agreement"] == 1.0
    assert "block0" in rep["stages"] and "block1" in rep["stages"]
    assert rep["logits_cosine"] > 0.999
    # the harness localizes error growth per block
    assert rep["stages"]["block1"]["max_abs"] >= 0.0


def test_vit_int8_accuracy():
    cfg = ViTConfig(image_size=32, patch=4, dim=64, depth=2, heads=2, num_classes=10)
    params = init_vit(jax.random.PRNGKey(0), cfg)
    flat = flatten_vit(params)
    qf = make_qforward(vit_extras(params), cfg.depth, cfg.heads, cfg.patch, cfg.dim)
    x = jnp.asarray(np.random.default_rng(1).normal(0, 1, (8, 32, 32, 3)), jnp.float32)
    fp32 = np.asarray(vit_forward(params, x, cfg))
    scales = calibrate(make_sites_fn(qf, cfg), flat, [x], INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    dep = np.asarray(qf(DeployCtx(qflat, scales, INT8_PER_CHANNEL), x, cfg))
    assert numerics.top1_agreement(dep, fp32) >= 7 / 8


def test_topk_energy_selection():
    fm = np.zeros((8, 8, 4), np.float32)
    fm[:, :, 2] = 10.0  # hottest channel
    fm[:, :, 0] = 1.0
    idx, energy = topk_energy_channels(fm, k=2)
    assert idx[0] == 2 and energy[0] > energy[1]


def test_make_grid_shape():
    chans = [np.zeros((4, 4), np.float32)] * 5
    g = make_grid(chans, ncols=3, pad=1)
    assert g.shape == (2 * 5 + 1, 3 * 5 + 1)


def test_inspect_taps_writes_pngs(tmp_path):
    taps = {"stage": jnp.asarray(np.random.default_rng(0).normal(0, 1, (1, 8, 8, 16)), jnp.float32)}
    rep = inspect_taps(taps, str(tmp_path), topk=4)
    assert os.path.exists(rep["stage"]["png"])
    assert len(rep["stage"]["channels"]) == 4


def test_runlog_xlsx_export(tmp_path):
    lg = RunLogger(root=str(tmp_path), script="exp.py", tag="t1")
    lg.log({"acc": 0.97, "ms": 12.5}, params={"bits": 8})
    lg.log({"acc": 0.95, "new_metric": 1}, params={"bits": 4})
    path = lg.export_xlsx()
    rows = read_xlsx_rows(path)
    assert len(rows) == 3  # header + 2
    header = rows[0]
    assert "m_acc" in header and "m_new_metric" in header  # auto-expanding cols
    assert "run_id" in header and "tag" in header


def test_runlog_decorator(tmp_path):
    lg = RunLogger(root=str(tmp_path), script="deco.py")

    @lg.log_returned_metrics(params={"k": 1})
    def work():
        return {"loss": 0.5}

    out = work()
    assert out == {"loss": 0.5}
    assert lg.rows()[0]["m_loss"] == 0.5

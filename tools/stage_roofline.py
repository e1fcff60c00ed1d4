"""Stage-by-stage roofline proof for the ResNet-18 headline path (VERDICT
r2 #7): is the 41% model-level MFU the PLATFORM floor, or is there headroom?

Method (one TPU process):
  1. cumulative-truncation stage times of the production fused2 forward at
     the headline batch (jit of `taps[stage]` — XLA dead-code-eliminates
     everything after the kept tap);
  2. per-shape XLA int8 conv measurements (eps-perturbed side arg, requant
     epilogue fused — the clean harness validated in bench_round2b A2) for
     every conv shape class in the model;
  3. the implied "XLA-floor" model time = sum over convs of
     ops/measured_shape_TOPS, confronted with the measured full forward.

If measured_full ~= implied_floor (+ the known stem/maxpool/interchange
overheads), the headline IS at the platform ceiling and the 41% MFU is a
shape property (OC=64 lane underfill at layer1, C=3 at the stem), not an
implementation gap. Context: the dual-pixel custom kernel designed to beat
the layer1 underfill measured 32 TOPS vs XLA's 157-198 (buried,
runlogs/r3/bench_round2b.jsonl); implicit-GEMM best was 146.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def conv_shapes_r18(batch):
    """Every conv shape class of ResNet-18 at 224px: (name, N, H, W, C, OC,
    k, stride, count) — H/W are INPUT dims."""
    return [
        ("l1_3x3", batch, 56, 56, 64, 64, 3, 1, 4),
        ("l2_down", batch, 56, 56, 64, 128, 1, 2, 1),
        ("l2_3x3s2", batch, 56, 56, 64, 128, 3, 2, 1),
        ("l2_3x3", batch, 28, 28, 128, 128, 3, 1, 3),
        ("l3_down", batch, 28, 28, 128, 256, 1, 2, 1),
        ("l3_3x3s2", batch, 28, 28, 128, 256, 3, 2, 1),
        ("l3_3x3", batch, 14, 14, 256, 256, 3, 1, 3),
        ("l4_down", batch, 14, 14, 256, 512, 1, 2, 1),
        ("l4_3x3s2", batch, 14, 14, 256, 512, 3, 2, 1),
        ("l4_3x3", batch, 7, 7, 512, 512, 3, 1, 3),
    ]


def measure_conv(name, N, H, W, C, OC, k, s, iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(-100, 100, (N, H, W, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-80, 80, (k, k, C, OC)), jnp.int8)
    sj = jnp.asarray(rng.random(OC) * 0.01 + 0.001, jnp.float32)
    bj = jnp.asarray(rng.normal(0, 1, OC), jnp.float32)
    eps = jnp.zeros((8, C), jnp.int8)
    pad = (k - 1) // 2
    OH, OW = H // s, W // s
    ops = 2 * N * OH * OW * OC * C * k * k

    def conv_eps(xb, e):
        xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
        acc = jax.lax.conv_general_dilated(
            xq, w, (s, s), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sj + bj
        return jnp.clip(jnp.round(jnp.maximum(y, 0.0) / 0.05), 0, 127).astype(jnp.int8)

    r = device_time_fn(conv_eps, x, eps, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    ms = r["ms_median"]
    return ms, ops, ops / (ms / 1e3) / 1e12


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from dlq_tpu.bench.roofline import PEAKS, detect_chip
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    batch = int(os.environ.get("BENCH_BATCH", "384"))
    iters = 8
    _emit(device=str(jax.devices()[0]), batch=batch)
    chip = detect_chip()
    peak = PEAKS.get(chip, {}).get("int8", 394e12)

    # ---- 2. per-shape XLA int8 conv rooflines ----
    shapes = conv_shapes_r18(batch)
    per_shape = {}
    conv_floor_ms = 0.0
    conv_ops_total = 0
    for (name, N, H, W, C, OC, k, s, count) in shapes:
        ms, ops, tops = measure_conv(name, N, H, W, C, OC, k, s, iters)
        per_shape[name] = (ms, ops, tops)
        conv_floor_ms += ms * count
        conv_ops_total += ops * count
        _emit(stage="conv_shape", name=name, count=count, ms=round(ms, 4),
              tops=round(tops, 1), pct_int8_peak=round(tops * 1e12 / peak * 100, 1))

    # ---- 1. cumulative-truncation stage times of the production path ----
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    def upto(stage):
        def f(p, xb):
            ctx = FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL)
            logits, taps = qforward_fused2(ctx, xb, cfg, taps=True)
            return logits if stage == "full" else jnp.sum(
                taps[stage].astype(jnp.float32))
        return f

    cum = {}
    for stage in ("stem", "layer1", "layer2", "layer3", "layer4", "full"):
        r = device_time_fn(upto(stage), payload, x, perturb_arg=1,
                           n_small=2, n_big=2 + iters)
        cum[stage] = r["ms_median"]
    full_ms = cum["full"]
    marg = {}
    prev = 0.0
    for stage in ("stem", "layer1", "layer2", "layer3", "layer4", "full"):
        marg[stage] = cum[stage] - prev
        prev = cum[stage]
    _emit(stage="cumulative", **{k: round(v, 3) for k, v in cum.items()})
    _emit(stage="marginal", **{k: round(v, 3) for k, v in marg.items()})

    # ---- 3. the verdict table ----
    # conv-only floor vs measured per stage
    stage_convs = {
        "layer1": [("l1_3x3", 4)],
        "layer2": [("l2_down", 1), ("l2_3x3s2", 1), ("l2_3x3", 3)],
        "layer3": [("l3_down", 1), ("l3_3x3s2", 1), ("l3_3x3", 3)],
        "layer4": [("l4_down", 1), ("l4_3x3s2", 1), ("l4_3x3", 3)],
    }
    for st, items in stage_convs.items():
        floor = sum(per_shape[n][0] * c for n, c in items)
        _emit(stage="stage_verdict", name=st, measured_ms=round(marg[st], 3),
              xla_conv_floor_ms=round(floor, 3),
              overhead_pct=round((marg[st] - floor) / max(floor, 1e-9) * 100, 1))
    ips = batch / (full_ms / 1e3)
    eff_tops = conv_ops_total / (full_ms / 1e3) / 1e12
    floor_ips = batch / (conv_floor_ms / 1e3)
    _emit(stage="model_verdict",
          measured_ms=round(full_ms, 3), img_s=round(ips, 0),
          conv_floor_ms=round(conv_floor_ms, 3),
          floor_img_s_convs_only=round(floor_ips, 0),
          stem_maxpool_head_ms=round(full_ms - conv_floor_ms - marg["layer1"]
                                     + sum(per_shape[n][0] * c
                                           for n, c in stage_convs["layer1"]), 3),
          eff_tops=round(eff_tops, 1),
          pct_int8_peak=round(eff_tops * 1e12 / peak * 100, 1),
          note="if measured_ms ~= conv_floor_ms + stem, the headline is at "
               "the XLA platform ceiling for these shapes")


if __name__ == "__main__":
    main()

"""Round-2b TPU probe (ONE process): decompose the phase-A harness anomaly,
sweep the dual-pixel kernel's DMA pipeline depth, and settle depthwise.

  A2. harness decomposition at the layer1 conv shape: the chained-slope
      harness rolls the (51 MB int8) input per iteration — measure the roll
      itself, then re-measure every conv variant with a tiny side-arg
      perturbation instead (x constant, eps rolled).
  B2. dual-pixel kernel: nbuf in {2,4,8}, in-model-style int8-out.
  C2. depthwise: chain-vs-stencil-chain EXACTNESS for the int8 grouped conv
      (the round-1 miscompile shape), then MNv2 DeployCtx model-level A/B
      across DLQ_DEPTHWISE impls with top-1 agreement gates.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def tops(ops, ms):
    return ops / (ms / 1e3) / 1e12


def phase_a2(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_conv import int8_conv3x3_s1_dp, pack_w_dual
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    N, C, OC = 256, 64, 64
    x = jnp.asarray(rng.integers(-100, 100, (N, 56, 56, C)), jnp.int8)
    xf = jnp.asarray(rng.normal(0, 1, (N, 56, 56, C)), jnp.float32)
    w = jnp.asarray(rng.integers(-80, 80, (3, 3, C, OC)), jnp.int8)
    sj = jnp.asarray((rng.random(OC) * 0.01 + 0.001), jnp.float32)
    bj = jnp.asarray(rng.normal(0, 1, OC), jnp.float32)
    s_out = jnp.float32(0.05)
    w6 = pack_w_dual(w)
    eps = jnp.zeros((8, 64), jnp.int8)  # tiny rolled side arg
    ops = 2 * N * 56 * 56 * OC * C * 9

    # 1. the roll itself: trivial consumer of the big int8 input
    r = device_time_fn(lambda xb: jnp.sum(xb.astype(jnp.int32)), x,
                       perturb_arg=0, n_small=2, n_big=2 + iters)
    _emit(phase="A2", variant="roll_plus_reduce_only", ms=round(r["ms_median"], 4))

    def conv_eps(xb, e):
        xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
        acc = jax.lax.conv_general_dilated(
            xq, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sj + bj
        return jnp.clip(jnp.round(jnp.maximum(y, 0.0) / s_out), 0, 127).astype(jnp.int8)

    r = device_time_fn(conv_eps, x, eps, perturb_arg=1, n_small=2,
                       n_big=2 + iters)
    _emit(phase="A2", variant="xla_int8out_epsperturb", ms=round(r["ms_median"], 4),
          tops=round(tops(ops, r["ms_median"]), 1))

    def conv_from_f32(xb):
        xq = jnp.clip(jnp.round(xb / 0.02), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32) * sj + bj
        return jnp.clip(jnp.round(jnp.maximum(y, 0.0) / s_out), 0, 127).astype(jnp.int8)

    r = device_time_fn(conv_from_f32, xf, perturb_arg=0, n_small=2,
                       n_big=2 + iters)
    _emit(phase="A2", variant="xla_int8out_quantize_fused", ms=round(r["ms_median"], 4),
          tops=round(tops(ops, r["ms_median"]), 1))

    # dual-pixel kernel: eps-perturbed, int8 out, nbuf sweep
    for nbuf in (2, 4, 8):
        for TB, TOH in ((1, 56), (2, 28), (4, 14)):
            try:
                def dp(xb, e, _tb=TB, _toh=TOH, _nb=nbuf):
                    xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
                    return int8_conv3x3_s1_dp(
                        xq, w6, sj, bj, out_scale=s_out, fuse_relu=True,
                        out_int8=True, interpret=False, tiles=(_tb, _toh),
                        nbuf=_nb)
                r = device_time_fn(dp, x, eps, perturb_arg=1, n_small=2,
                                   n_big=2 + iters)
                _emit(phase="B2", variant="dp_int8out", nbuf=nbuf, TB=TB,
                      TOH=TOH, ms=round(r["ms_median"], 4),
                      tops=round(tops(ops, r["ms_median"]), 1))
            except Exception as e:
                _emit(phase="B2", variant="dp_int8out", nbuf=nbuf, TB=TB,
                      TOH=TOH, error=str(e)[:150])


def phase_c2(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward,
    )
    from dlq_tpu.ops.qops import _depthwise_int8_stencil
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import DeployCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(1)

    # chain exactness at the historical miscompile shape: int8 grouped conv
    # fused with a requant epilogue, referenced against the STENCIL chain
    for N, H, W, C, s in ((256, 56, 56, 144, 1), (256, 112, 112, 96, 2)):
        x = jnp.asarray(rng.integers(-100, 100, (N, H, W, C)), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 80, (3, 3, 1, C)), jnp.int8)
        stride, pads = (s, s), [(1, 1), (1, 1)]

        def chain(acc):
            y = acc.astype(jnp.float32) * 0.003 + 0.1
            return jnp.clip(jnp.round(y / 0.021), 0, 127).astype(jnp.int8)

        def f_int8(xb):
            return chain(jax.lax.conv_general_dilated(
                xb, w, stride, pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C, preferred_element_type=jnp.int32))

        def f_sten(xb):
            return chain(_depthwise_int8_stencil(xb, w, stride, pads))

        got = np.asarray(jax.jit(f_int8)(x[:4]))
        ref = np.asarray(jax.jit(f_sten)(x[:4]))
        _emit(phase="C2", check="chain_int8_vs_stencil_chain",
              shape=[N, H, W, C, s], exact=bool(np.array_equal(got, ref)),
              mismatch_frac=float(np.mean(got != ref)))

    # MNv2 model-level A/B across depthwise impls
    cfg = MobileNetV2Config(num_classes=1000)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    batch = 384
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    outs = {}
    for impl in ("stencil", "fp32", "int8"):

        def fwd(p, xb, _i=impl):
            # explicit ctx param (round-3 API: resolved at construction,
            # never read from env at trace time)
            return qf(DeployCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                                depthwise=_i), xb, cfg)

        outs[impl] = np.asarray(jax.jit(fwd)(payload, x[:8]))
        if impl == "stencil":
            continue  # oracle only — too slow to time at full batch
        r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ips = batch / (r["ms_median"] / 1e3)
        _emit(phase="C2", variant=f"mnv2_deploy_{impl}", batch=batch,
              ms=round(r["ms_median"], 3), img_s=round(ips, 0))
    for impl in ("fp32", "int8"):
        d = numerics.diff(outs[impl], outs["stencil"])
        _emit(phase="C2", check=f"mnv2_{impl}_vs_stencil",
              max_abs=float(d.max_abs), cosine=float(d.cosine),
              top1=numerics.top1_agreement(outs[impl], outs["stencil"]))


def phase_d2(iters=8):
    """MNv2 fully-int8 interchange (fused2) UNPARK attempt: repro case B now
    PASSES on this libtpu (runlogs/r3/repro_int8_bugs.txt), so re-test the
    path that was parked on the int8-epilogue miscompile — correctness vs
    DeployCtx (its fp32-interchange oracle) and throughput vs DeployCtx."""
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.mobilenetv2 import (
        MobileNetV2Config, block_meta, fold_mobilenetv2, init_mobilenetv2,
        make_qforward, make_qforward_fused,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import (
        DeployCtx, FullFusedCtx, make_sites_fn, quantize_weights,
    )
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(2)
    cfg = MobileNetV2Config(num_classes=1000)
    params = init_mobilenetv2(jax.random.PRNGKey(0), cfg)
    flat = fold_mobilenetv2(params)
    qf = make_qforward(block_meta(cfg))
    qff = make_qforward_fused(block_meta(cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qf, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    batch = 384
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    def fwd_deploy(p, xb):
        return qf(DeployCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                            depthwise="int8"), xb, cfg)

    def fwd_fused(p, xb):
        return qff(FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                                depthwise="int8"), xb, cfg)

    ld = np.asarray(jax.jit(fwd_deploy)(payload, x[:8]))
    lf = np.asarray(jax.jit(fwd_fused)(payload, x[:8]))
    d = numerics.diff(lf, ld)
    _emit(phase="D2", check="mnv2_fused2_vs_deploy", cosine=float(d.cosine),
          max_abs=float(d.max_abs), top1=numerics.top1_agreement(lf, ld),
          finite=bool(np.isfinite(lf).all()),
          constant=bool(np.std(lf) < 1e-6))
    for name, fn in (("mnv2_fused2", fwd_fused),):
        r = device_time_fn(fn, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ips = batch / (r["ms_median"] / 1e3)
        _emit(phase="D2", variant=name, batch=batch,
              ms=round(r["ms_median"], 3), img_s=round(ips, 0))


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax

    _emit(device=str(jax.devices()[0]))
    which = sys.argv[1:] or ["a2", "c2"]
    if "a2" in which:
        phase_a2()
    if "c2" in which:
        phase_c2()
    if "d2" in which:
        phase_d2()


if __name__ == "__main__":
    main()

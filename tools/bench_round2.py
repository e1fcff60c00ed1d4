"""Round-2 TPU kernel campaign (ONE process — relay rule).

  A. layer1 conv class (C=OC=64, 3x3/s1, 56x56): XLA int8 conv anchor vs
     the dual-pixel packed kernel (ops/pallas_conv.int8_conv3x3_s1_dp)
     across tile configs, f32-out and int8-out epilogues.
  B. model-level ResNet-18 FullFusedCtx b384 with/without dp_conv.
  C. depthwise int8 (MobileNetV2 shapes): is XLA's int8 grouped conv still
     miscompiling on the current libtpu? raw / optimization_barrier'd /
     fp32-on-int / int32-stencil variants, correctness vs the exact oracle
     + timing; model-level MNv2 if a faster correct variant exists.

Emits one JSON line per measurement.
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


def phase_a_layer1(batches=(256, 384), iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_conv import (
        int8_conv3x3_s1, int8_conv3x3_s1_dp, pack_w_dual,
    )
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    C = OC = 64
    w = rng.integers(-80, 80, (3, 3, C, OC)).astype(np.int8)
    scale = (rng.random(OC) * 0.01 + 0.001).astype(np.float32)
    bias = rng.normal(0, 1, OC).astype(np.float32)
    s_out = np.float32(0.05)
    w6 = jnp.asarray(np.asarray(pack_w_dual(jnp.asarray(w))))
    wj, sj, bj = jnp.asarray(w), jnp.asarray(scale), jnp.asarray(bias)

    for N in batches:
        x = jnp.asarray(rng.integers(-100, 100, (N, 56, 56, C)), jnp.int8)
        ops = 2 * N * 56 * 56 * OC * C * 9

        # ---- XLA int8 conv anchors ----
        def xla_f32(xb):
            acc = jax.lax.conv_general_dilated(
                xb, wj, (1, 1), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * sj + bj
            return jnp.maximum(y, 0.0)

        def xla_int8(xb):
            y = xla_f32(xb)
            return jnp.clip(jnp.round(y / s_out), 0.0, 127.0).astype(jnp.int8)

        for name, fn in (("xla_f32out", xla_f32), ("xla_int8out", xla_int8)):
            r = device_time_fn(fn, x, perturb_arg=0, n_small=2, n_big=2 + iters)
            _emit(phase="A", variant=name, batch=N, ms=round(r["ms_median"], 4),
                  tops=round(tops(ops, r["ms_median"]), 1))

        # ---- old implicit-GEMM kernel (best-known cfg) ----
        try:
            def old_k(xb):
                return int8_conv3x3_s1(xb, wj, sj, bj, fuse_relu=True,
                                       interpret=False)
            r = device_time_fn(old_k, x, perturb_arg=0, n_small=2, n_big=2 + iters)
            _emit(phase="A", variant="old_implicit_gemm", batch=N,
                  ms=round(r["ms_median"], 4), tops=round(tops(ops, r["ms_median"]), 1))
        except Exception as e:
            _emit(phase="A", variant="old_implicit_gemm", batch=N,
                  error=str(e)[:200])

        # ---- dual-pixel kernel tile sweep ----
        for TB, TOH in ((1, 56), (2, 56), (4, 56), (8, 56), (2, 28), (4, 28),
                        (8, 28), (16, 28), (4, 14), (8, 14)):
            if N % TB:
                continue
            for oname, oint8 in (("f32out", False), ("int8out", True)):
                try:
                    def dp(xb, _tb=TB, _toh=TOH, _o=oint8):
                        return int8_conv3x3_s1_dp(
                            xb, w6, sj, bj,
                            out_scale=jnp.float32(s_out) if _o else None,
                            fuse_relu=True, out_int8=_o, interpret=False,
                            tiles=(_tb, _toh))
                    r = device_time_fn(dp, x, perturb_arg=0, n_small=2,
                                       n_big=2 + iters)
                    _emit(phase="A", variant=f"dp_{oname}", batch=N, TB=TB,
                          TOH=TOH, ms=round(r["ms_median"], 4),
                          tops=round(tops(ops, r["ms_median"]), 1))
                except Exception as e:
                    _emit(phase="A", variant=f"dp_{oname}", batch=N, TB=TB,
                          TOH=TOH, error=str(e)[:160])

        # correctness spot-check on-device (small slice)
        ref = np.asarray(jax.jit(xla_f32)(x[:2]))
        got = np.asarray(int8_conv3x3_s1_dp(x[:2], w6, sj, bj, fuse_relu=True,
                                            interpret=False))
        _emit(phase="A", check="dp_vs_xla_f32", batch=N,
              max_abs=float(np.max(np.abs(got - ref))))


def phase_b_model(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
    from dlq_tpu.models.resnet import (
        ResNetConfig, flatten_folded, fold_resnet, init_resnet, qforward,
        qforward_fused2,
    )
    from dlq_tpu.quant.calibrate import calibrate
    from dlq_tpu.quant.model_quant import FullFusedCtx, make_sites_fn, quantize_weights
    from dlq_tpu.quant.qconfig import INT8_PER_CHANNEL
    from dlq_tpu.timing import device_time_fn

    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    rng = np.random.default_rng(0)
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib, INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    batch = 384
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    outs = {}
    for name, dp in (("fused2", False), ("fused2_dpconv", True)):
        def fwd(p, xb, _dp=dp):
            ctx = FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                               dp_conv=_dp)
            return qforward_fused2(ctx, xb, cfg)

        r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ips = batch / (r["ms_median"] / 1e3)
        outs[name] = np.asarray(jax.jit(fwd)(payload, x[:8]))
        _emit(phase="B", variant=name, batch=batch,
              ms=round(r["ms_median"], 3), img_s=round(ips, 0))
    d = numerics.diff(outs["fused2_dpconv"], outs["fused2"])
    _emit(phase="B", check="dp_vs_xla_model",
          max_abs=float(d.max_abs), cosine=float(d.cosine))


def phase_c_depthwise(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.qops import _depthwise_int8_fp32conv, _depthwise_int8_stencil
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(1)
    shapes = [  # (N, H, W, C, stride) — MNv2 1.0x depthwise sites
        (256, 112, 112, 96, 2),
        (256, 56, 56, 144, 1),
        (256, 56, 56, 144, 2),
        (256, 28, 28, 192, 1),
        (256, 14, 14, 576, 1),
    ]
    for N, H, W, C, s in shapes:
        x = jnp.asarray(rng.integers(-100, 100, (N, H, W, C)), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 80, (3, 3, 1, C)), jnp.int8)
        stride = (s, s)
        pads = [(1, 1), (1, 1)]
        OH = (H + 2 - 3) // s + 1
        ops = 2 * N * OH * OH * C * 9

        def dw_int8_raw(xb):
            return jax.lax.conv_general_dilated(
                xb, w, stride, pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C, preferred_element_type=jnp.int32)

        def dw_int8_barrier(xb):
            acc = jax.lax.conv_general_dilated(
                xb, w, stride, pads,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=C, preferred_element_type=jnp.int32)
            return jax.lax.optimization_barrier(acc)

        def dw_fp32(xb):
            return _depthwise_int8_fp32conv(xb, w, stride, pads)

        def dw_stencil(xb):
            return _depthwise_int8_stencil(xb, w, stride, pads)

        # exact oracle from the stencil (int32)
        ref = np.asarray(jax.jit(dw_stencil)(x[:2]))
        for name, fn in (("int8_grouped_raw", dw_int8_raw),
                         ("int8_grouped_barrier", dw_int8_barrier),
                         ("fp32_on_int", dw_fp32),
                         ("stencil_int32", dw_stencil)):
            try:
                got = np.asarray(jax.jit(fn)(x[:2]))
                exact = bool(np.array_equal(got, ref))
                r = device_time_fn(fn, x, perturb_arg=0, n_small=2,
                                   n_big=2 + iters)
                _emit(phase="C", variant=name, shape=[N, H, W, C, s],
                      exact=exact, ms=round(r["ms_median"], 4),
                      tops=round(tops(ops, r["ms_median"]), 2))
            except Exception as e:
                _emit(phase="C", variant=name, shape=[N, H, W, C, s],
                      error=str(e)[:200])

        # the documented failure mode was epilogue FUSION: int8 grouped conv
        # + requant chain, compared against the same chain on the fp32 path
        def chain(xb, conv):
            acc = conv(xb)
            y = acc.astype(jnp.float32) * 0.003 + 0.1
            y = jnp.clip(jnp.round(y / 0.021), 0, 127).astype(jnp.int8)
            return y

        ref_c = np.asarray(jax.jit(lambda xb: chain(xb, dw_fp32))(x[:2]))
        for name, conv in (("chain_int8_raw", dw_int8_raw),
                           ("chain_int8_barrier", dw_int8_barrier)):
            try:
                got_c = np.asarray(jax.jit(lambda xb, _c=conv: chain(xb, _c))(x[:2]))
                _emit(phase="C", variant=name, shape=[N, H, W, C, s],
                      exact=bool(np.array_equal(got_c, ref_c)))
            except Exception as e:
                _emit(phase="C", variant=name, shape=[N, H, W, C, s],
                      error=str(e)[:200])


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax

    _emit(device=str(jax.devices()[0]), backend=jax.default_backend())
    which = sys.argv[1:] or ["a", "b", "c"]
    if "a" in which:
        phase_a_layer1()
    if "b" in which:
        phase_b_model()
    if "c" in which:
        phase_c_depthwise()


if __name__ == "__main__":
    main()

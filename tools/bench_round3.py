"""Round-3 TPU probe: the WIDTH-PAIR PACKED XLA conv (qops.conv_int8_dpx)
for the layer1 C=OC=64 class — the dual-pixel packing idea re-expressed as
pure XLA ops (free reshapes + one 3x2 conv at 128x128 channels) after the
Pallas kernel version was measured-rejected (32 TOPS, runlogs/r3).

  A3. standalone at the layer1 shape: direct conv vs packed rewrite, both
      eps-side-arg perturbed with the fused requant epilogue (the clean
      harness from bench_round2b A2).
  B3. in-model: fused2 b384 headline path, dp_conv=False vs dp_conv="xla",
      exactness + throughput.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def phase_a3(iters=8):
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.qops import conv_int8_dpx, pack_w_dual_xla
    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(0)
    N, C, OC = 256, 64, 64
    x = jnp.asarray(rng.integers(-100, 100, (N, 56, 56, C)), jnp.int8)
    w = jnp.asarray(rng.integers(-80, 80, (3, 3, C, OC)), jnp.int8)
    w2 = pack_w_dual_xla(w)
    sj = jnp.asarray(rng.random(OC) * 0.01 + 0.001, jnp.float32)
    bj = jnp.asarray(rng.normal(0, 1, OC), jnp.float32)
    eps = jnp.zeros((8, C), jnp.int8)
    ops = 2 * N * 56 * 56 * OC * C * 9  # USEFUL macs (overhead is the rewrite's cost)

    def epi(acc):
        y = acc.astype(jnp.float32) * sj + bj
        return jnp.clip(jnp.round(jnp.maximum(y, 0.0) / 0.05), 0, 127).astype(jnp.int8)

    def direct(xb, e):
        xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
        return epi(jax.lax.conv_general_dilated(
            xq, w, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32))

    def packed(xb, e):
        xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
        return epi(conv_int8_dpx(xq, w2))

    got = np.asarray(jax.jit(packed)(x[:4], eps))
    ref = np.asarray(jax.jit(direct)(x[:4], eps))
    _emit(phase="A3", check="exact", equal=bool(np.array_equal(got, ref)))
    for name, fn in (("direct", direct), ("packed_dpx", packed)):
        r = device_time_fn(fn, x, eps, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ms = r["ms_median"]
        _emit(phase="A3", variant=name, ms=round(ms, 4),
              useful_tops=round(ops / (ms / 1e3) / 1e12, 1))


def phase_b3(iters=10):
    import jax
    import jax.numpy as jnp

    from dlq_tpu import numerics
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

    rng = np.random.default_rng(0)
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    outs = {}
    for name, dp in (("fused2", False), ("fused2_dpx", "xla")):
        def fwd(p, xb, _dp=dp):
            return qforward_fused2(
                FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                             dp_conv=_dp), xb, cfg)

        outs[name] = np.asarray(jax.jit(fwd)(payload, x[:8]))
        r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ms = r["ms_median"]
        _emit(phase="B3", variant=name, batch=batch, ms=round(ms, 3),
              img_s=round(batch / (ms / 1e3), 0))
    d = numerics.diff(outs["fused2_dpx"], outs["fused2"])
    _emit(phase="B3", check="dpx_vs_plain", max_abs=float(d.max_abs),
          exact=bool(np.array_equal(outs["fused2_dpx"], outs["fused2"])))


def phase_c3(iters=8):
    """Stride-2 shape rewrites (stage_roofline: l2_3x3s2 runs at 24% of
    int8 peak, the 1x1/s2 downsamples at 7-27%):

      s2d rewrite of 3x3/s2: space-to-depth(2) the input (one transpose) ->
      2x2-window VALID conv at 4C input channels; 16C/9C = 1.78x MAC
      overhead against a potential 24%->90% utilization move.

      1x1/s2 as slice+matmul: strided slice then [B*OH*OW, C] @ [C, OC].
    """
    import jax
    import jax.numpy as jnp

    from dlq_tpu.timing import device_time_fn

    rng = np.random.default_rng(1)
    N = 256
    for (C, OC, H) in ((64, 128, 56), (128, 256, 28)):
        x = jnp.asarray(rng.integers(-100, 100, (N, H, H, C)), jnp.int8)
        w = jnp.asarray(rng.integers(-80, 80, (3, 3, C, OC)), jnp.int8)
        sj = jnp.asarray(rng.random(OC) * 0.01 + 0.001, jnp.float32)
        eps = jnp.zeros((8, C), jnp.int8)
        OH = H // 2
        ops = 2 * N * OH * OH * OC * C * 9

        def epi(acc):
            y = acc.astype(jnp.float32) * sj
            return jnp.clip(jnp.round(jnp.maximum(y, 0.0) / 0.05), 0, 127).astype(jnp.int8)

        def direct(xb, e):
            xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
            return epi(jax.lax.conv_general_dilated(
                xq, w, (2, 2), [(1, 1), (1, 1)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))

        # s2d weights: W4[t_h, t_w, (kh*2+kw)*C + c, oc] for original tap
        # (u,v): u = 2*t_h + kh, v = 2*t_w + kw (the pad-1 shift is applied
        # to x explicitly before the s2d reshape)
        w4 = np.zeros((2, 2, 4 * C, OC), np.int8)
        wn = np.asarray(w)
        for th in range(2):
            for kh in range(2):
                for tw in range(2):
                    for kw_ in range(2):
                        u = 2 * th + kh
                        v = 2 * tw + kw_
                        if 0 <= u < 3 and 0 <= v < 3:
                            blk = (kh * 2 + kw_)
                            w4[th, tw, blk * C:(blk + 1) * C, :] = wn[u, v]
        w4j = jnp.asarray(w4)

        def s2d(xb, e):
            xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
            xp = jnp.pad(xq, ((0, 0), (1, 1), (1, 1), (0, 0)))  # H+2
            h2 = (H + 2) // 2
            nb = xq.shape[0]
            x4 = xp.reshape(nb, h2, 2, h2, 2, C).transpose(0, 1, 3, 2, 4, 5)
            x4 = x4.reshape(nb, h2, h2, 4 * C)
            acc = jax.lax.conv_general_dilated(
                x4, w4j, (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return epi(acc)

        got = np.asarray(jax.jit(s2d)(x[:4], eps))
        ref = np.asarray(jax.jit(direct)(x[:4], eps))
        _emit(phase="C3", shape=[C, OC, H], check="s2d_exact",
              equal=bool(np.array_equal(got, ref)))
        for name, fn in (("direct_s2", direct), ("s2d_2x2", s2d)):
            r = device_time_fn(fn, x, eps, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            ms = r["ms_median"]
            _emit(phase="C3", shape=[C, OC, H], variant=name,
                  ms=round(ms, 4),
                  useful_tops=round(ops / (ms / 1e3) / 1e12, 1))

    # 1x1/s2 downsample: direct conv vs slice+matmul
    for (C, OC, H) in ((64, 128, 56), (128, 256, 28), (256, 512, 14)):
        x = jnp.asarray(rng.integers(-100, 100, (N, H, H, C)), jnp.int8)
        w1 = jnp.asarray(rng.integers(-80, 80, (1, 1, C, OC)), jnp.int8)
        sj = jnp.asarray(rng.random(OC) * 0.01 + 0.001, jnp.float32)
        eps = jnp.zeros((8, C), jnp.int8)
        OH = H // 2
        ops = 2 * N * OH * OH * OC * C

        def epi1(acc):
            y = acc.astype(jnp.float32) * sj
            return jnp.clip(jnp.round(y / 0.05), -127, 127).astype(jnp.int8)

        def direct1(xb, e):
            xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
            return epi1(jax.lax.conv_general_dilated(
                xq, w1, (2, 2), [(0, 0), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32))

        w2d = w1.reshape(C, OC)

        def slicemm(xb, e):
            xq = xb + e[0, :].astype(jnp.int8)[None, None, None, :]
            nb = xq.shape[0]
            xs = xq[:, ::2, ::2, :].reshape(nb * OH * OH, C)
            acc = jax.lax.dot(xs, w2d, preferred_element_type=jnp.int32)
            return epi1(acc.reshape(nb, OH, OH, OC))

        got = np.asarray(jax.jit(slicemm)(x[:4], eps))
        # direct on the same 4 — shapes: slicemm uses N in reshape; redo per-call N
        ref = np.asarray(jax.jit(direct1)(x[:4], eps))
        _emit(phase="C3", shape=[C, OC, H], check="downsample_exact",
              equal=bool(np.array_equal(got.reshape(ref.shape), ref)))
        for name, fn in (("down_direct", direct1), ("down_slicemm", slicemm)):
            r = device_time_fn(fn, x, eps, perturb_arg=1, n_small=2,
                               n_big=2 + iters)
            ms = r["ms_median"]
            _emit(phase="C3", shape=[C, OC, H], variant=name,
                  ms=round(ms, 4),
                  useful_tops=round(ops / (ms / 1e3) / 1e12, 1))


def phase_d3(iters=10):
    """In-model ladder of the exact conv rewrites on the fused2 headline
    path (b384): plain vs +dpx vs +s2d vs +down_mm, exactness-gated."""
    import jax
    import jax.numpy as jnp

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

    rng = np.random.default_rng(0)
    cfg = ResNetConfig(depth=18, num_classes=1000)
    params = init_resnet(jax.random.PRNGKey(0), cfg)
    flat = flatten_folded(fold_resnet(params, cfg))
    calib = [jnp.asarray(rng.normal(0, 1, (8, 224, 224, 3)), jnp.float32)]
    scales = calibrate(make_sites_fn(qforward, cfg), flat, calib,
                       INT8_PER_CHANNEL)
    qflat = quantize_weights(flat, INT8_PER_CHANNEL)
    payload = {"qflat": qflat, "scales": scales}
    batch = int(os.environ.get("BENCH_BATCH", "384"))
    x = jnp.asarray(rng.normal(0, 1, (batch, 224, 224, 3)), jnp.float32)

    combos = [(), ("dpx",), ("s2d",), ("down_mm",),
              ("dpx", "s2d"), ("dpx", "s2d", "down_mm")]
    ref = None
    for rw in combos:
        def fwd(p, xb, _rw=rw):
            return qforward_fused2(
                FullFusedCtx(p["qflat"], p["scales"], INT8_PER_CHANNEL,
                             rewrites=_rw), xb, cfg)

        out = np.asarray(jax.jit(fwd)(payload, x[:8]))
        if ref is None:
            ref = out
        exact = bool(np.array_equal(out, ref))
        r = device_time_fn(fwd, payload, x, perturb_arg=1, n_small=2,
                           n_big=2 + iters)
        ms = r["ms_median"]
        _emit(phase="D3", rewrites=list(rw), batch=batch, ms=round(ms, 3),
              img_s=round(batch / (ms / 1e3), 0), exact_vs_plain=exact)


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax

    _emit(device=str(jax.devices()[0]))
    which = sys.argv[1:] or ["a3", "b3"]
    if "a3" in which:
        phase_a3()
    if "b3" in which:
        phase_b3()
    if "c3" in which:
        phase_c3()
    if "d3" in which:
        phase_d3()


if __name__ == "__main__":
    main()

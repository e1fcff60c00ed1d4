"""Minimal repros for the two TPU-backend int8 miscompile families we work
around (see BENCH_NOTES.md "Environment facts" + ops/qops.py docstrings):

  A. int8 grouped (depthwise) conv fused with quantize/rescale epilogues:
     non-deterministic NaN/zero outputs. Workaround: fp32-on-int-values conv
     (_depthwise_int8_fp32conv).
  B. int8 conv + requant-to-int8 epilogue chains on wide tensors (the
     MobileNetV2 fused2 path): finite-but-constant outputs.

Run on a TPU backend to re-test after libtpu updates:
  python tools/repro_int8_backend_bugs.py
Prints PASS (bug gone — remove the workaround) or MISCOMPILE per case, with
max_abs vs the fp32-on-int oracle. Exits 0 iff all PASS.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    failures = 0

    # --- case A: depthwise int8 conv with quantize + rescale epilogue ---
    C = 96
    x = jnp.asarray(rng.normal(0, 1, (8, 32, 32, C)), jnp.float32)
    w = jnp.asarray(rng.integers(-127, 128, (3, 3, 1, C)), jnp.int8)
    act_scale = jnp.float32(0.05)
    w_scale = jnp.asarray(rng.uniform(0.001, 0.02, (C,)), jnp.float32)

    def depthwise_int8(xf):
        xq = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)
        acc = jax.lax.conv_general_dilated(
            xq, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=C, preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (act_scale * w_scale)
        return jnp.maximum(y, 0.0)  # the epilogue that provokes the fusion bug

    def depthwise_stencil(xf):
        # oracle = exact int32 stencil (NOT the fp32-on-int conv: that path
        # lowers through bf16 MXU passes on TPU and is itself inexact —
        # round-2 finding, BENCH_NOTES "Depthwise int8")
        from dlq_tpu.ops.qops import _depthwise_int8_stencil

        xq = jnp.clip(jnp.round(xf / act_scale), -127, 127).astype(jnp.int8)
        acc = _depthwise_int8_stencil(xq, w, (1, 1), [(1, 1), (1, 1)])
        y = acc.astype(jnp.float32) * (act_scale * w_scale)
        return jnp.maximum(y, 0.0)

    oracle = np.asarray(jax.jit(depthwise_stencil)(x))
    got = np.asarray(jax.jit(depthwise_int8)(x))
    d = float(np.abs(got - oracle).max()) if np.isfinite(got).all() else float("inf")
    ok = d < 1e-3
    failures += not ok
    print(f"[{'PASS' if ok else 'MISCOMPILE'}] A int8 grouped conv + requant epilogue: "
          f"max_abs={d:.3g} finite={bool(np.isfinite(got).all())}")

    # --- case B: int8 conv -> requant-to-int8 -> int8 conv chain ---
    Cw = 192  # "wide expand tensor" shape class from the mnv2 fused2 path
    x2 = jnp.asarray(rng.normal(0, 1, (8, 16, 16, 32)), jnp.float32)
    w1 = jnp.asarray(rng.integers(-127, 128, (1, 1, 32, Cw)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-127, 128, (3, 3, Cw, Cw)), jnp.int8)
    s_in, s_mid = jnp.float32(0.05), jnp.float32(0.4)
    ws1 = jnp.asarray(rng.uniform(0.001, 0.02, (Cw,)), jnp.float32)
    ws2 = jnp.asarray(rng.uniform(0.001, 0.02, (Cw,)), jnp.float32)

    def chain(xf, conv_dtype):
        pet = jnp.int32 if conv_dtype == jnp.int8 else jnp.float32
        xq = jnp.clip(jnp.round(xf / s_in), -127, 127).astype(jnp.int8)
        a1 = jax.lax.conv_general_dilated(
            xq.astype(conv_dtype), w1.astype(conv_dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=pet)
        y1 = a1.astype(jnp.float32) * (s_in * ws1)
        y1 = jnp.clip(y1, 0.0, 6.0)  # relu6 folded into the requant
        q1 = jnp.clip(jnp.round(y1 / s_mid), -127, 127).astype(jnp.int8)
        a2 = jax.lax.conv_general_dilated(
            q1.astype(conv_dtype), w2.astype(conv_dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), preferred_element_type=pet)
        return a2.astype(jnp.float32) * (s_mid * ws2)

    oracle = np.asarray(jax.jit(lambda a: chain(a, jnp.float32))(x2))
    got = np.asarray(jax.jit(lambda a: chain(a, jnp.int8))(x2))
    d = float(np.abs(got - oracle).max()) if np.isfinite(got).all() else float("inf")
    # "finite-but-constant" symptom: near-zero output variance
    constant = bool(np.isfinite(got).all()) and float(np.std(got)) < 1e-6 < float(np.std(oracle))
    ok = d < 1e-2 and not constant
    failures += not ok
    print(f"[{'PASS' if ok else 'MISCOMPILE'}] B int8 conv->requant->int8 conv chain: "
          f"max_abs={d:.3g} constant_output={constant}")

    print(f"backend={jax.default_backend()} devices={jax.devices()}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())

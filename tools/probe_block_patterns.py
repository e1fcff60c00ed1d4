"""Mosaic probe round 2: patterns for fused residual-block kernels (and a
stem retry). Established green by pallas_conv/pallas_vit_block on this
backend: 4D int8 slabs with C>=128 on lanes, unaligned SUBLANE slices,
leading-dim merge reshapes, int8 dots, f32 epilogues. New patterns probed
here:

  A. sublane->lane pair-merge reshape [232,920]->[116,1840] (i8 and f32)
  S. strided sublane slices (stride 2) on a 4D slab  -> stride-2 conv taps
  L. strided lane slice (stride 8, grain 4)          -> stem without s2d prep
  O. int8 output BlockSpec (quantized write-out)
  D. the composed double-conv: conv3x3 -> requant i8 -> conv3x3 ->
     requant + residual add + relu -> i8 (the BasicBlock tail pattern)

Run on TPU single-process; CPU validates semantics in interpret mode.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    def run(name, kernel, out_shape, inputs, expect, scratch=None, atol=0.5):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(*out_shape),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch or [],
                interpret=interpret,
            )
            jfn = jax.jit(fn)
            got = np.asarray(jfn(*inputs))
            err = float(np.abs(got.astype(np.float64)
                               - expect.astype(np.float64)).max())
            ok = err <= atol and np.isfinite(got.astype(np.float64)).all()
            print(f"[{'OK' if ok else 'FAIL'}] {name}: max_abs={err:.3g}",
                  flush=True)
            return ok
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return False

    x8 = jnp.asarray(rng.integers(-127, 127, (232, 920)), jnp.int8)
    xf = np.asarray(x8, np.int32)

    # A. sublane->lane pair-merge reshape, i8 and f32
    def kA(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(116, 1840)

    run("A1 reshape [232,920]->[116,1840] i8", kA, ((116, 1840), jnp.int8),
        [x8], xf.reshape(116, 1840))

    x32 = x8.astype(jnp.float32)

    def kA2(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(116, 1840)

    run("A2 reshape [232,920]->[116,1840] f32", kA2, ((116, 1840), jnp.float32),
        [x32], xf.reshape(116, 1840).astype(np.float64))

    # S. strided sublane slice on a 4D slab: slab[:, kh:kh+2*8:2, kw:kw+2*8:2, :]
    slab = jnp.asarray(rng.integers(-127, 127, (1, 18, 18, 128)), jnp.int8)
    sf = np.asarray(slab, np.int32)

    def kS(x_ref, o_ref):
        o_ref[:] = x_ref[:, 1:17:2, 1:17:2, :]

    run("S strided(2) sublane slices 4D i8", kS, ((1, 8, 8, 128), jnp.int8),
        [slab], sf[:, 1:17:2, 1:17:2, :])

    # L. strided lane slice: [230, 928] take lanes start=4, stride 8, width 4
    y8 = jnp.asarray(rng.integers(-127, 127, (232, 928)), jnp.int8)
    yf = np.asarray(y8, np.int32)

    def kL(x_ref, o_ref):
        v = x_ref[:].reshape(232, 116, 8)
        o_ref[:] = v[:, :, 4:]   # lane split to 3D then take half-group

    run("L lane split [232,928]->[232,116,8] + half i8", kL,
        ((232, 116, 4), jnp.int8), [y8], yf.reshape(232, 116, 8)[:, :, 4:])

    # O. int8 output blockspec: quantize-in-kernel write
    a8 = jnp.asarray(rng.integers(-127, 127, (256, 1024)), jnp.int8)

    def kO(x_ref, o_ref):
        y = x_ref[:].astype(jnp.float32) * 0.11
        o_ref[:] = jnp.clip(jnp.round(y), -127, 127).astype(jnp.int8)

    expO = np.clip(np.round(np.asarray(a8, np.float64) * np.float32(0.11)),
                   -127, 127)
    run("O int8 out blockspec + requant", kO, ((256, 1024), jnp.int8),
        [a8], expO, atol=1.0)

    # D. composed double 3x3 conv with int8 interchange (BasicBlock core),
    #    flat-dot form on a [1, TOH+4, OW+4, 128] slab, OC=128
    TOH, OW, C = 8, 16, 128
    slab2 = jnp.asarray(rng.integers(-20, 20, (1, TOH + 4, OW + 4, C)), jnp.int8)
    w1 = jnp.asarray(rng.integers(-8, 8, (9, C, C)), jnp.int8)
    w2 = jnp.asarray(rng.integers(-8, 8, (9, C, C)), jnp.int8)
    s1 = np.float32(0.013)
    s2 = np.float32(0.017)

    def kD(x_ref, w1_ref, w2_ref, o_ref, h_scr):
        rows1 = (TOH + 2) * (OW + 2)
        acc = jnp.zeros((rows1, C), jnp.int32)
        for kh in range(3):
            for kw in range(3):
                a = x_ref[:, kh : kh + TOH + 2, kw : kw + OW + 2, :].reshape(rows1, C)
                acc += jax.lax.dot(a, w1_ref[kh * 3 + kw],
                                   preferred_element_type=jnp.int32)
        h = jnp.clip(jnp.round(acc.astype(jnp.float32) * s1), 0, 127)
        h_scr[:] = h.astype(jnp.int8).reshape(1, TOH + 2, OW + 2, C)
        rows2 = TOH * OW
        acc2 = jnp.zeros((rows2, C), jnp.int32)
        for kh in range(3):
            for kw in range(3):
                a = h_scr[:, kh : kh + TOH, kw : kw + OW, :].reshape(rows2, C)
                acc2 += jax.lax.dot(a, w2_ref[kh * 3 + kw],
                                    preferred_element_type=jnp.int32)
        res = x_ref[:, 2 : 2 + TOH, 2 : 2 + OW, :].reshape(rows2, C).astype(jnp.int32)
        y = jnp.clip(jnp.round(acc2.astype(jnp.float32) * s2) + res, 0, 127)
        o_ref[:] = y.astype(jnp.int8).reshape(1, TOH, OW, C)

    def refD():
        xpad = np.asarray(slab2, np.int64)[0]
        w1f = np.asarray(w1, np.int64).reshape(3, 3, C, C)
        w2f = np.asarray(w2, np.int64).reshape(3, 3, C, C)
        acc = np.zeros((TOH + 2, OW + 2, C), np.int64)
        for kh in range(3):
            for kw in range(3):
                acc += np.einsum("hwc,cd->hwd",
                                 xpad[kh : kh + TOH + 2, kw : kw + OW + 2, :],
                                 w1f[kh, kw])
        h = np.clip(np.round(acc * np.float32(s1)), 0, 127)
        acc2 = np.zeros((TOH, OW, C), np.float64)
        for kh in range(3):
            for kw in range(3):
                acc2 += np.einsum("hwc,cd->hwd",
                                  h[kh : kh + TOH, kw : kw + OW, :],
                                  w2f[kh, kw])
        res = xpad[2 : 2 + TOH, 2 : 2 + OW, :]
        return np.clip(np.round(acc2 * np.float32(s2)) + res, 0, 127)[None]

    run("D fused double-conv + i8 interchange", kD,
        ((1, TOH, OW, C), jnp.int8), [slab2, w1, w2], refD(),
        scratch=[pltpu.VMEM((1, TOH + 2, OW + 2, C), jnp.int8)], atol=1.0)

    print(f"backend={jax.default_backend()}")


if __name__ == "__main__":
    sys.exit(main())

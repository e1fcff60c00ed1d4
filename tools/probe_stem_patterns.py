"""Mosaic capability probes for the fused ResNet stem kernel (pallas_stem).

Kernel design under test: prep (XLA) = quantize + pad to [N,232,920] int8
(rows 4+4, cols 4+2, ch 3->4). In-kernel: pair-row merge reshape
[232,920]->[116,1840] (s2d for free), 32 tap pieces (r,a,b) sliced at
row offset a (grain 1) / lane offset r*920+8b (grain 8), each reshaped
[112,896]->[12544,8] and written into an im2col scratch [12544,256] at
8-lane offsets; one int8 MXU dot vs [256,64]; fused scale+bias+relu+requant;
in-VMEM 3x3/s2 maxpool via merge reshapes + sublane shifts.

Each probe exercises one pattern; J composes the full cols build; K the
full pool. Run on TPU (single process!); CPU uses interpret (semantics only).
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
            t0 = time.perf_counter()
            for _ in range(10):
                r = jfn(*inputs)
            jax.tree_util.tree_map(
                lambda a: a.block_until_ready()
                if hasattr(a, "block_until_ready") else a, r)
            ms = (time.perf_counter() - t0) * 100
            print(f"[{'OK' if ok else 'FAIL'}] {name}: max_abs={err:.3g} ~{ms:.2f}ms/call",
                  flush=True)
            return ok
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:200]}", flush=True)
            return False

    x8 = jnp.asarray(rng.integers(-127, 127, (232, 920)), jnp.int8)
    xf = np.asarray(x8, np.int32)

    # A. pair-row merge reshape [232,920] -> [116,1840] int8
    def kA(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(116, 1840)

    run("A reshape [232,920]->[116,1840] i8", kA, ((116, 1840), jnp.int8),
        [x8], xf.reshape(116, 1840))

    # B. lane->sublane split reshape [112,896] -> [12544,8] int8
    def kB(x_ref, o_ref):
        o_ref[:] = x_ref[:112, :896].reshape(12544, 8)

    run("B reshape [112,896]->[12544,8] i8", kB, ((12544, 8), jnp.int8),
        [x8], xf[:112, :896].reshape(12544, 8))

    # C. row slice at grain-1 offset + lane slice at grain-8 offset
    def kC(x_ref, o_ref):
        m = x_ref[:].reshape(116, 1840)
        o_ref[:] = m[3:115, 920 + 8 : 920 + 8 + 896]

    run("C slice rows@3 lanes@928 i8", kC, ((112, 896), jnp.int8),
        [x8], xf.reshape(116, 1840)[3:115, 928:1824])

    # D. 8-lane-offset scratch writes int8
    def kD(x_ref, o_ref, scr):
        for t in range(16):
            scr[:, 8 * t : 8 * t + 8] = x_ref[:128, 8 * t : 8 * t + 8]
        o_ref[:] = scr[:]

    run("D 8-lane-offset scratch writes i8", kD, ((128, 128), jnp.int8),
        [x8], xf[:128, :128], scratch=[pltpu.VMEM((128, 128), jnp.int8)])

    # E. int8 dot [12544,256]x[256,64] -> int32 (N=64 lanes)
    a8 = jnp.asarray(rng.integers(-127, 127, (12544, 256)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-5, 5, (256, 64)), jnp.int8)

    def kE(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot(a_ref[:], b_ref[:],
                               preferred_element_type=jnp.int32)

    expE = np.asarray(a8, np.int32) @ np.asarray(b8, np.int32)
    run("E i8 dot M12544 K256 N64 -> i32", kE, ((12544, 64), jnp.int32),
        [a8, b8], expE)

    # J. composed cols build: 32 (row,lane)-offset pieces -> [12544,256] scratch
    def kJ(x_ref, o_ref, scr):
        m = x_ref[:].reshape(116, 1840)
        t = 0
        for r in range(2):
            for a in range(4):
                for b in range(4):
                    piece = m[a : a + 112, r * 920 + 8 * b : r * 920 + 8 * b + 896]
                    scr[:, 8 * t : 8 * t + 8] = piece.reshape(12544, 8)
                    t += 1
        o_ref[:] = scr[:]

    mref = xf.reshape(116, 1840)
    expJ = np.zeros((12544, 256), np.int32)
    t = 0
    for r in range(2):
        for a in range(4):
            for b in range(4):
                expJ[:, 8 * t : 8 * t + 8] = (
                    mref[a : a + 112, r * 920 + 8 * b : r * 920 + 8 * b + 896]
                    .reshape(12544, 8))
                t += 1
    run("J full cols build (32 pieces)", kJ, ((12544, 256), jnp.int8),
        [x8], expJ, scratch=[pltpu.VMEM((12544, 256), jnp.int8)])

    # K. in-VMEM 3x3/s2 maxpool on [12544,64] i8 (=[112,112,64]) -> [56,3584]
    c8 = jnp.asarray(rng.integers(-127, 127, (12544, 64)), jnp.int8)

    def kK(x_ref, o_ref):
        q = x_ref[:]
        f = q.reshape(112, 56, 128)              # rows i, (pair b', s*64+oc)
        ev, od = f[:, :, :64], f[:, :, 64:]
        wmax = jnp.maximum(ev, od)
        neg = jnp.full((112, 1, 64), -128, jnp.int8)
        odp = jnp.concatenate([neg, od[:, :55, :]], axis=1)
        wm = jnp.maximum(wmax, odp)              # [112,56,64]
        g = wm.reshape(112, 3584).reshape(56, 7168)
        hev, hod = g[:, :3584], g[:, 3584:]
        hmax = jnp.maximum(hev, hod)
        negr = jnp.full((1, 3584), -128, jnp.int8)
        hodp = jnp.concatenate([negr, hod[:55, :]], axis=0)
        o_ref[:] = jnp.maximum(hmax, hodp)

    y = np.asarray(c8, np.int32).reshape(112, 112, 64)
    yp = np.full((114, 114, 64), -128, np.int64)
    yp[1:113, 1:113] = y
    expK = np.zeros((56, 56, 64), np.int64)
    for i in range(56):
        for j in range(56):
            expK[i, j] = yp[2 * i : 2 * i + 3, 2 * j : 2 * j + 3].max((0, 1))
    run("K in-VMEM 3x3/s2 maxpool i8", kK, ((56, 3584), jnp.int8),
        [c8], expK.reshape(56, 3584))

    print(f"backend={jax.default_backend()}")


if __name__ == "__main__":
    sys.exit(main())

"""Mosaic capability probes for the fused ViT block kernel (NEXT: mega-kernel).

Each probe compiles + runs a minimal pallas kernel exercising one pattern we
need, printing OK/FAIL with the numeric check. Run on the TPU backend
(single process!); CPU runs use interpret mode and only validate semantics.

Patterns:
  1. lane-slice read at a 64 (sub-tile) offset
  2. lane-offset write into a VMEM scratch
  3. NT matmul via dot_general (((1,),(1,)),((),())) — contraction on lanes
  4. in-kernel reshape merging leading dims [Bt,N,D] -> [Bt*N,D]
  5. tanh (gelu-tanh epilogue) inside the kernel
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import functools

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

    def run(name, kernel, out_shape, inputs, expect, scratch=None):
        try:
            fn = pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct(*out_shape),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM) for _ in inputs],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=scratch or [],
                interpret=interpret,
            )
            got = np.asarray(jax.jit(fn)(*inputs))
            err = float(np.abs(got - expect).max())
            ok = err < 2e-2 and np.isfinite(got).all()
            print(f"[{'OK' if ok else 'FAIL'}] {name}: max_abs={err:.3g}")
            return ok
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:160]}")
            return False

    x = jnp.asarray(rng.normal(0, 1, (256, 768)), jnp.bfloat16)
    xf = np.asarray(x, np.float32)

    # 1. 64-offset lane slice read
    def k1(x_ref, o_ref):
        o_ref[:] = x_ref[:, 64:128]

    run("lane-slice read @64", k1, ((256, 64), jnp.bfloat16), [x], xf[:, 64:128])

    # 2. lane-offset writes into scratch, then copy out
    def k2(x_ref, o_ref, scr):
        for h in range(4):
            scr[:, 64 * h : 64 * h + 64] = x_ref[:, 64 * h : 64 * h + 64] * 2
        o_ref[:] = scr[:]

    run("lane-offset scratch writes", k2, ((256, 256), jnp.bfloat16),
        [x[:, :256]], xf[:, :256] * 2,
        scratch=[pltpu.VMEM((256, 256), jnp.bfloat16)])

    # 3. NT matmul: q [256,64] @ k [256,64]^T via dot_general on lane dims
    q = jnp.asarray(rng.normal(0, 1, (256, 64)), jnp.bfloat16)
    kk = jnp.asarray(rng.normal(0, 1, (256, 64)), jnp.bfloat16)

    def k3(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    expect3 = np.asarray(q, np.float32) @ np.asarray(kk, np.float32).T
    ok3 = run("NT dot_general (contract lanes)", k3, ((256, 256), jnp.float32),
              [q, kk], expect3)

    # 4. in-kernel reshape merging leading dims
    y = jnp.asarray(rng.normal(0, 1, (4, 256, 256)), jnp.bfloat16)

    def k4(y_ref, o_ref):
        o_ref[:] = y_ref[:].reshape(4 * 256, 256) * 2

    run("reshape [4,256,256]->[1024,256]", k4, ((1024, 256), jnp.bfloat16),
        [y], np.asarray(y, np.float32).reshape(1024, 256) * 2)

    # 5. tanh in kernel
    def k5(x_ref, o_ref):
        o_ref[:] = jnp.tanh(x_ref[:].astype(jnp.float32)).astype(jnp.bfloat16)

    run("tanh epilogue", k5, ((256, 768), jnp.bfloat16), [x],
        np.tanh(xf).astype(np.float32))

    # 6. full head loop: slices + NT dot + softmax + AV + lane-offset write
    qkv = jnp.asarray(rng.normal(0, 1, (256, 768)), jnp.bfloat16)

    def k6(qkv_ref, o_ref, scr):
        col = jax.lax.broadcasted_iota(jnp.int32, (256, 256), 1)
        for h in range(4):
            qh = qkv_ref[:, 64 * h : 64 * h + 64]
            kh = qkv_ref[:, 256 + 64 * h : 256 + 64 * h + 64]
            vh = qkv_ref[:, 512 + 64 * h : 512 + 64 * h + 64]
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32) * 0.125
            s = jnp.where(col < 197, s, -1e30)
            m = jnp.max(s, -1, keepdims=True)
            p = jnp.exp(s - m)
            attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
            scr[:, 64 * h : 64 * h + 64] = jax.lax.dot(
                attn, vh, preferred_element_type=jnp.float32).astype(jnp.bfloat16)
        o_ref[:] = scr[:]

    def ref6(qkv):
        out = np.zeros((256, 256), np.float32)
        qkvf = np.asarray(qkv, np.float32)
        for h in range(4):
            qh = qkvf[:, 64 * h : 64 * h + 64]
            kh = qkvf[:, 256 + 64 * h : 256 + 64 * h + 64]
            vh = qkvf[:, 512 + 64 * h : 512 + 64 * h + 64]
            s = qh @ kh.T * 0.125
            s[:, 197:] = -1e30
            p = np.exp(s - s.max(-1, keepdims=True))
            attn = (p / p.sum(-1, keepdims=True)).astype(np.float32)
            out[:, 64 * h : 64 * h + 64] = attn @ vh
        return out

    run("full in-kernel MHSA (4 heads)", k6, ((256, 256), jnp.bfloat16),
        [qkv], ref6(qkv), scratch=[pltpu.VMEM((256, 256), jnp.bfloat16)])

    print(f"backend={jax.default_backend()}")


if __name__ == "__main__":
    main()

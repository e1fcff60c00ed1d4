"""Mosaic probe: 3D batched dot_general + leading-dim split reshape —
the patterns needed to batch the fused ViT block's per-(sample,head)
attention dots (currently 48 small serial dots per grid step).

Run on TPU single-process; CPU validates semantics via interpret.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    def run(name, kernel, out_shape, inputs, expect, scratch=None, atol=2e-2):
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
            err = float(np.abs(got.astype(np.float64)
                               - expect.astype(np.float64)).max())
            rel = err / max(1e-9, float(np.abs(expect).max()))
            ok = rel <= atol and np.isfinite(got.astype(np.float64)).all()
            print(f"[{'OK' if ok else 'FAIL'}] {name}: rel={rel:.3g}", flush=True)
            return ok
        except Exception as e:
            print(f"[FAIL] {name}: {type(e).__name__}: {str(e)[:140]}", flush=True)
            return False

    B, Np, hd = 8, 200, 64
    q = jnp.asarray(rng.normal(0, 1, (B, Np, hd)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(0, 1, (B, Np, hd)), jnp.bfloat16)
    qf = np.asarray(q, np.float32)
    kf = np.asarray(k, np.float32)

    # A. batched NT dot: [B,Np,hd] x [B,Np,hd] -> [B,Np,Np]
    def kA(q_ref, k_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            q_ref[:], k_ref[:], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    expA = np.einsum("bnh,bmh->bnm", qf, kf)
    okA = run("A batched NT dot [8,200,64]^2 -> [8,200,200]", kA,
              ((B, Np, Np), jnp.float32), [q, k], expA)

    # B. batched NN dot (AV): [B,Np,Np] x [B,Np,hd] -> [B,Np,hd]
    a = jnp.asarray(rng.uniform(0, 1, (B, Np, Np)), jnp.bfloat16)
    af = np.asarray(a, np.float32)

    def kB(a_ref, v_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], v_ref[:], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)

    expB = np.einsum("bnm,bmh->bnh", af, kf)
    run("B batched NN dot [8,200,200]x[8,200,64]", kB,
        ((B, Np, hd), jnp.float32), [a, k], expB)

    # C. leading-dim split reshape [1600,576] -> [8,200,576] (bf16)
    x2 = jnp.asarray(rng.normal(0, 1, (1600, 576)), jnp.bfloat16)

    def kC(x_ref, o_ref):
        o_ref[:] = x_ref[:].reshape(8, 200, 576)

    run("C split reshape [1600,576]->[8,200,576]", kC,
        ((8, 200, 576), jnp.bfloat16), [x2],
        np.asarray(x2, np.float32).reshape(8, 200, 576))

    # D. 3D lane slice at 64-grain + softmax over last dim + scratch write
    def kD(x_ref, o_ref, scr):
        y = x_ref[:].reshape(8, 200, 576)
        qh = y[:, :, 0:64]
        kh = y[:, :, 64:128]
        s = jax.lax.dot_general(qh, kh, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        m = jnp.max(s, -1, keepdims=True)
        p = jnp.exp(s - m)
        attn = (p / jnp.sum(p, -1, keepdims=True)).astype(jnp.bfloat16)
        vh = y[:, :, 128:192]
        av = jax.lax.dot_general(attn, vh, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        scr[:, :, 64:] = jnp.zeros_like(scr[:, :, 64:])
        scr[:, :, 0:64] = av.astype(jnp.bfloat16)
        o_ref[:] = scr[:]

    x2f = np.asarray(x2, np.float32).reshape(8, 200, 576)
    s = np.einsum("bnh,bmh->bnm", x2f[:, :, 0:64], x2f[:, :, 64:128])
    p = np.exp(s - s.max(-1, keepdims=True))
    attn = (p / p.sum(-1, keepdims=True))
    av = np.einsum("bnm,bmh->bnh", attn.astype(np.float32), x2f[:, :, 128:192])
    expD = np.zeros((8, 200, 192), np.float32)
    expD[:, :, 0:64] = av
    run("D full batched-attention head", kD, ((8, 200, 192), jnp.bfloat16),
        [x2], expD, scratch=[pltpu.VMEM((8, 200, 192), jnp.bfloat16)])

    print(f"backend={jax.default_backend()}")


if __name__ == "__main__":
    main()

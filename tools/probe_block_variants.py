"""Bisect the Mosaic 'unsupported shape cast' in the fused block kernels:
try each (geometry x wide_k x flat_mask x tb) combination directly on the
real kernels with random packs. Prints OK (with numeric check vs the
FullFusedCtx-composition semantics computed in numpy) or the error class.

Run on TPU single-process. Usage: python tools/probe_block_variants.py
"""

import itertools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _np_conv3x3(x, w):  # x [N,H,W,C] int, w [3,3,C,OC]
    N, H, W, C = x.shape
    OC = w.shape[-1]
    xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = np.zeros((N, H, W, OC), np.int64)
    for kh in range(3):
        for kw in range(3):
            out += np.einsum("nhwc,cd->nhwd",
                             xp[:, kh : kh + H, kw : kw + W, :], w[kh, kw])
    return out


def main():
    from dlq_tpu.platform import apply_platform_env

    apply_platform_env()
    import jax
    import jax.numpy as jnp

    from dlq_tpu.ops.pallas_block import basic_block_fused, _regroup_kw

    interpret = jax.default_backend() == "cpu"
    rng = np.random.default_rng(0)

    def try_combo(N, H, W, C, tb, wide_k, flat_mask):
        name = f"basic H{H} C{C} tb{tb} wide_k={int(wide_k)} flat={int(flat_mask)}"
        CP = max(C, 128)
        x = rng.integers(-100, 100, (N, H, W, C)).astype(np.int8)
        w1 = rng.integers(-8, 8, (3, 3, C, C)).astype(np.int8)
        w2 = rng.integers(-8, 8, (3, 3, C, C)).astype(np.int8)
        s1 = rng.uniform(0.001, 0.002, C).astype(np.float32)
        s2 = rng.uniform(0.001, 0.002, C).astype(np.float32)
        b1 = rng.normal(0, 0.5, C).astype(np.float32)
        b2 = rng.normal(0, 0.5, C).astype(np.float32)
        inv = np.asarray([[9.0, 7.0, 0.9]], np.float32)  # inv_mid, inv_nxt, rs
        pack = {
            "inv": jnp.asarray(inv),
            "w1": _regroup_kw(jnp.asarray(w1), CP),
            "s1": jnp.asarray(s1).reshape(1, -1),
            "b1": jnp.asarray(b1).reshape(1, -1),
            "w2": _regroup_kw(jnp.asarray(w2), C),
            "s2": jnp.asarray(s2).reshape(1, -1),
            "b2": jnp.asarray(b2).reshape(1, -1),
        }
        # numpy reference (composition semantics)
        acc1 = _np_conv3x3(x.astype(np.int64), w1.astype(np.int64))
        h = np.clip(np.round((acc1 * s1 + b1) * inv[0, 0]), 0, 127)
        acc2 = _np_conv3x3(h.astype(np.int64), w2.astype(np.int64))
        z = np.clip(np.round((acc2 * s2 + b2) * inv[0, 1]), -127, 127)
        r = np.clip(np.round(x.astype(np.float32) * inv[0, 2]), -127, 127)
        ref = np.clip(z + r, 0, 127)
        try:
            got = np.asarray(basic_block_fused(
                jnp.asarray(x), pack, tb=tb, wide_k=wide_k,
                flat_mask=flat_mask, interpret=interpret))
            agree = float((got == ref).mean())
            ok = agree >= 0.999
            print(f"[{'OK' if ok else 'FAIL'}] {name}: agree={agree:.5f}",
                  flush=True)
        except Exception as e:
            msg = str(e)
            key = ("shape cast" if "shape cast" in msg else msg[:90])
            print(f"[FAIL] {name}: {type(e).__name__}: {key}", flush=True)

    # geometry ladder: l2-like (C=128), l1-like (C=64, lane pad), tb 1/2,
    # wide_k x flat_mask
    for (C, H), tb, wk, fm in itertools.product(
            [(128, 28), (64, 28)], [1, 2], [True, False], [True, False]):
        try_combo(N=2, H=H, W=H, C=C, tb=tb, wide_k=wk, flat_mask=fm)

    print(f"backend={jax.default_backend()}")


if __name__ == "__main__":
    sys.exit(main())

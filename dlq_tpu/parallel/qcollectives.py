"""Quantized collectives: int8/bf16 compressed all-reduce for TP boundaries.

The GSPMD path (parallel/shard.py) lets XLA insert fp32 collectives. For
multi-host tensor parallelism the all-reduce at a K-sharded matmul boundary
is wire-bound (ICI within a slice, DCN across slices), and the tensors being
reduced are activations we already tolerate at int8 precision everywhere
else — so compress the wire, EQuARX-style (PAPERS.md): quantize, exchange
int8, reduce, re-quantize, gather.

Two-phase int8 all-reduce traffic per device is ~2x the tensor's int8 bytes
vs ~8x fp32 bytes for a ring psum: a 4x wire reduction at a cost of two
rounding steps (measured cosine >= 0.9999 on activation-scale data, gated in
tests/test_qcollectives.py).

These run inside shard_map (explicit collectives — the one place we don't
let GSPMD choose, because GSPMD cannot change the wire dtype of its own
collectives).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P


def _wire_quantize(x: jnp.ndarray):
    """Per-device symmetric int8: (values, scale scalar)."""
    amax = jnp.max(jnp.abs(x)).astype(jnp.float32)
    scale = jnp.maximum(amax, 1e-30) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -127, 127).astype(jnp.int8)
    return q, scale


def psum_bf16(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """All-reduce with bf16 wire dtype (2x compression, ~lossless for
    activation sums). Accumulation is the collective's own (bf16 adds) —
    acceptable for the short TP axes we target (<= 16 devices)."""
    return jax.lax.psum(x.astype(jnp.bfloat16), axis_name).astype(x.dtype)


def qpsum_int8(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Two-phase int8 all-reduce (reduce-scatter + all-gather, both int8).

    Phase 1: quantize locally, all_to_all so device d receives chunk d of
    every peer, dequantize with each peer's scale, sum in fp32 (the
    reduction itself is full precision — only the wire is int8).
    Phase 2: re-quantize the reduced chunk, all_gather values + scales,
    dequantize and reassemble.

    x: per-device addend, any shape; leading dim must be divisible by the
    axis size (pad outside if needed). Returns sum over the axis, fp32.
    """
    n = jax.lax.axis_size(axis_name)
    lead = x.shape[0]
    assert lead % n == 0, (x.shape, n)
    xf = x.astype(jnp.float32)

    # phase 1 — reduce-scatter with int8 wire
    q1, s1 = _wire_quantize(xf)
    q1 = q1.reshape((n, lead // n) + x.shape[1:])
    recv = jax.lax.all_to_all(q1, axis_name, split_axis=0, concat_axis=0, tiled=False)
    # recv[j] = my chunk from peer j; scales: one scalar per peer
    s_all = jax.lax.all_gather(s1, axis_name)  # [n]
    partial = jnp.tensordot(
        s_all, recv.astype(jnp.float32).reshape(n, -1), axes=1
    ).reshape((lead // n,) + x.shape[1:])

    # phase 2 — all-gather the reduced chunk with int8 wire
    q2, s2 = _wire_quantize(partial)
    qg = jax.lax.all_gather(q2, axis_name)          # [n, lead//n, ...]
    sg = jax.lax.all_gather(s2, axis_name)          # [n]
    full = qg.astype(jnp.float32) * sg.reshape((n,) + (1,) * x.ndim)
    return full.reshape(x.shape)


WIRE_MODES: dict[str, Callable] = {
    "fp32": lambda x, ax: jax.lax.psum(x, ax),
    "bf16": psum_bf16,
    "int8": qpsum_int8,
}


def tp_qdense_head(
    x: jnp.ndarray,        # [B, K] activations (batch-sharded over "data")
    w_int8: jnp.ndarray,   # [K, N] int8 weight values, K-sharded over "model"
    w_scale: jnp.ndarray,  # () or (N,) fp32 weight scale (replicated)
    bias,                  # (N,) fp32 or None
    act_scale: jnp.ndarray,  # () fp32 calibrated activation scale
    mesh: Mesh,
    wire: str = "int8",
    act_qmax: int = 127,
    data_axis: str = "data",
    model_axis: str = "model",
) -> jnp.ndarray:
    """The PRODUCTION quantized TP classifier head: K-sharded W8A8 dense
    whose boundary all-reduce runs with a compressed wire dtype.

    Each model-rank holds a [K/mp, N] int8 weight shard and the matching
    channel slice of the (already channel-sharded, since the last conv's OC
    is model-sharded) feature vector; it quantizes its slice with the
    calibrated act scale, runs the int8 partial matmul, and the fp32
    partials are summed with WIRE_MODES[wire] — int8 wire is ~4x less ICI/
    DCN bytes than the fp32 psum GSPMD would insert at this boundary.

    Used by DeployCtx.dense when Engine(..., tensor_parallel=True,
    wire=...) is set (see engine.py); wire="fp32" keeps GSPMD behavior.

    Also the BODY-boundary collective for wire_scope="mlp": the ViT MLP's
    fc2 is the Megatron row-parallel dense (fc1 column-parallel/OC-sharded
    feeds it a model-sharded hidden), so its boundary all-reduce compresses
    identically; 3D [B, N, K] token activations flatten to rows here.
    """
    lead = x.shape[:-1]
    if x.ndim != 2:
        x = x.reshape(-1, x.shape[-1])
    reduce = WIRE_MODES[wire]
    mp = mesh.shape[model_axis]
    B, K = x.shape
    N = w_int8.shape[-1]
    assert K % mp == 0, (x.shape, mp)
    dp = mesh.shape[data_axis]
    assert (B // dp) % mp == 0 or wire != "int8", (
        f"int8 wire reduce-scatter needs local rows {B}//{dp} divisible "
        f"by model axis {mp}")

    def local(xl, wl):
        xq = jnp.clip(jnp.round(xl.astype(jnp.float32) / act_scale),
                      -act_qmax, act_qmax).astype(jnp.int8)
        part = jax.lax.dot(xq, wl, preferred_element_type=jnp.int32)
        part = part.astype(jnp.float32) * (act_scale * w_scale)
        y = reduce(part, model_axis)
        if bias is not None:
            y = y + bias
        return y

    from jax import shard_map

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(data_axis, model_axis), P(model_axis, None)),
        out_specs=P(data_axis, None),
        check_vma=False,
    )
    y = f(x, w_int8)
    return y.reshape(lead + (N,)) if len(lead) != 1 else y


def tp_matmul_ksharded(
    x: jnp.ndarray,    # [M, K] replicated activations
    w: jnp.ndarray,    # [K, N] weight, K-sharded over `mesh` axis "model"
    mesh: Mesh,
    wire: str = "int8",
    axis: str = "model",
) -> jnp.ndarray:
    """K-(contraction-)sharded TP matmul whose boundary all-reduce runs with
    a compressed wire dtype. Demonstrator + building block for multi-host
    serving where the boundary crosses DCN.

    Each device holds a [K/n, N] weight shard, computes its partial [M, N],
    and the partials are summed with the selected wire mode.
    """
    reduce = WIRE_MODES[wire]
    n = mesh.shape[axis]
    K = x.shape[-1]
    assert K % n == 0

    def local(xl, wl):
        part = jnp.dot(
            xl.reshape(-1, K // n), wl, preferred_element_type=jnp.float32
        )
        return reduce(part, axis)

    from jax import shard_map

    f = shard_map(
        local, mesh=mesh,
        in_specs=(P(None, axis), P(axis, None)),
        out_specs=P(),
        check_vma=False,
    )
    return f(x, w)

"""Sharding rules: place params and batches onto a (data, model) mesh.

GSPMD style — we annotate placements with NamedSharding and let XLA insert
and schedule the collectives (all-gather / reduce-scatter / psum over ICI),
rather than hand-writing transports (SURVEY §2.7: the scaling-book recipe).

Tensor-parallel rule for conv nets: shard the OUTPUT-channel axis (last axis
of HWIO conv weights, IO dense weights, and of biases / per-channel scales).
Activations stay batch-sharded; XLA propagates channel shardings through the
network and inserts the boundary collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from dlq_tpu.quant.quantize import QTensor


def _tp_spec_for(arr, mesh: Mesh, axis: str = "model"):
    """Shard the last axis over `axis` when divisible, else replicate."""
    n = mesh.shape[axis]
    shape = getattr(arr, "shape", ())
    if len(shape) >= 1 and shape[-1] % n == 0 and shape[-1] >= n:
        return P(*([None] * (len(shape) - 1) + [axis]))
    return P()


def shard_params_tp(params: Any, mesh: Mesh) -> Any:
    """Place every weight/bias/scale with its output-channel axis sharded
    over "model". QTensor leaves shard values AND per-channel scales
    consistently (both have the channel as last axis)."""

    def place(leaf):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            return jax.device_put(leaf, NamedSharding(mesh, _tp_spec_for(leaf, mesh)))
        return leaf

    return jax.tree_util.tree_map(place, params)


# The ONLY sites the wire-compressed TP dense path may take: the classifier
# head. Shared by kshard_head_sites (layout) and DeployCtx._tp_dense_ok
# (routing) so layout and routing can never disagree — intermediate denses
# (e.g. MLP fc1/fc2) stay on the OC-sharded GSPMD path.
TP_HEAD_SITES: tuple = ("fc", "head")


def kshard_head_sites(payload: Any, mesh: Mesh,
                      sites: tuple = TP_HEAD_SITES) -> Any:
    """Re-place the classifier-head QTensor with its CONTRACTION (K) axis
    sharded over "model" — the layout tp_qdense_head (wire-compressed TP
    boundary collective) consumes. Per-channel scales/bias stay replicated.
    No-op for payloads without a matching 2D head site."""
    import dataclasses

    qflat = payload.get("qflat") if isinstance(payload, dict) else None
    if qflat is None:
        return payload
    mp = mesh.shape["model"]
    for s in sites:
        p = qflat.get(s)
        qw = p.get("qw") if isinstance(p, dict) else None
        if (isinstance(qw, QTensor) and qw.values.ndim == 2
                and qw.bits == 8 and qw.values.shape[0] % mp == 0):
            vals = jax.device_put(qw.values, NamedSharding(mesh, P("model", None)))
            scale = jax.device_put(qw.scale, NamedSharding(mesh, P()))
            p["qw"] = dataclasses.replace(qw, values=vals, scale=scale)
            if p.get("b") is not None:
                p["b"] = jax.device_put(p["b"], NamedSharding(mesh, P()))
    return payload


def replicate(tree: Any, mesh: Mesh) -> Any:
    def place(leaf):
        if isinstance(leaf, (jax.Array, np.ndarray)):
            return jax.device_put(leaf, NamedSharding(mesh, P()))
        return leaf

    return jax.tree_util.tree_map(place, tree)


def shard_batch(x: jax.Array, mesh: Mesh) -> jax.Array:
    """Batch-shard an activation/input along "data" (axis 0)."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def pad_to_batch(x, batch: int):
    """Pad axis 0 up to `batch` (engines run fixed batch shapes so XLA
    compiles once; remainder batches pad and mask)."""
    n = x.shape[0]
    if n == batch:
        return x, n
    if n > batch:
        raise ValueError(f"batch {n} > engine batch {batch}")
    pad = [(0, batch - n)] + [(0, 0)] * (x.ndim - 1)
    return np.pad(np.asarray(x), pad), n

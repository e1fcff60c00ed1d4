"""MNIST MLP 784-256-10 — the reference's training-ladder model.

Hyperparameter/init contract from `CUDA/MNIST_on_GPU/v1.py:50-65` (shared by
v2-v5 so curves are comparable): He-uniform init, SGD lr=0.01, batch 8,
softmax cross-entropy, accuracy = mean per-batch accuracy.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from dlq_tpu.models.registry import register
from dlq_tpu.models.common import dense, he_uniform, relu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class MLPConfig:
    in_dim: int = 784
    hidden: Tuple[int, ...] = (256,)
    num_classes: int = 10
    dtype: Any = jnp.float32


def init_mlp(key, cfg: MLPConfig) -> Params:
    dims = (cfg.in_dim,) + tuple(cfg.hidden) + (cfg.num_classes,)
    layers = []
    keys = jax.random.split(key, len(dims) - 1)
    for i, (din, dout) in enumerate(zip(dims[:-1], dims[1:])):
        layers.append(
            {
                "w": he_uniform(keys[i], (din, dout), fan_in=din, dtype=cfg.dtype),
                "b": jnp.zeros((dout,), cfg.dtype),
            }
        )
    return {"layers": layers}


def mlp_forward(params: Params, x: jnp.ndarray, cfg: MLPConfig = MLPConfig(), taps: bool = False):
    """x: [B, in_dim] -> logits [B, classes]; relu between layers."""
    t = {}
    y = x
    n = len(params["layers"])
    for i, layer in enumerate(params["layers"]):
        y = dense(y, layer["w"], layer["b"])
        if i < n - 1:
            y = relu(y)
        if taps:
            t[f"fc{i+1}"] = y
    if taps:
        return y, t
    return y


def softmax_cross_entropy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Mean softmax-CE; the grad wrt logits is (p - onehot)/B, matching the
    reference's manual backward (`v2.py:119-123`)."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    # one-hot contraction instead of gather: identical math, and it keeps a
    # class-axis (tensor-parallel) sharding resolvable as a reduction
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    nll = -jnp.sum(logp * onehot, axis=-1)
    return jnp.mean(nll)


def flatten_params(params: Params) -> Params:
    """Flat {site: {"w","b"}} for the quantizer (dense weights are IO)."""
    return {f"fc{i+1}": {"w": l["w"], "b": l["b"]} for i, l in enumerate(params["layers"])}


def qforward(ctx, x: jnp.ndarray, cfg: MLPConfig = MLPConfig(), taps: bool = False):
    """Shared quantized-topology definition (observe/deploy/simulate)."""
    t = {}
    y = x
    n = len(cfg.hidden) + 1
    for i in range(n):
        y = ctx.dense(f"fc{i+1}", y, fuse_relu=(i < n - 1))
        if taps:
            t[f"fc{i+1}"] = y
    if taps:
        return y, t
    return y


@register("mlp")
def _build_mlp(**kw):
    cfg = MLPConfig(**kw)
    return cfg, init_mlp, mlp_forward

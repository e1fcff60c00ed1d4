"""LeNet-5 for MNIST (BASELINE config 1's CNN option): conv5x5(6)->pool->
conv5x5(16)->pool->fc120->fc84->fc10, NHWC, avg-pooling, relu."""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dlq_tpu.models.registry import register
from dlq_tpu.models.common import avgpool2d, conv2d, dense, he_uniform, relu

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class LeNetConfig:
    num_classes: int = 10
    in_channels: int = 1
    dtype: Any = jnp.float32


def init_lenet(key, cfg: LeNetConfig) -> Params:
    ks = jax.random.split(key, 5)
    d = cfg.dtype
    return {
        "conv1": {"w": he_uniform(ks[0], (5, 5, cfg.in_channels, 6), fan_in=25 * cfg.in_channels, dtype=d),
                  "b": jnp.zeros((6,), d)},
        "conv2": {"w": he_uniform(ks[1], (5, 5, 6, 16), fan_in=25 * 6, dtype=d),
                  "b": jnp.zeros((16,), d)},
        "fc1": {"w": he_uniform(ks[2], (16 * 5 * 5, 120), fan_in=400, dtype=d), "b": jnp.zeros((120,), d)},
        "fc2": {"w": he_uniform(ks[3], (120, 84), fan_in=120, dtype=d), "b": jnp.zeros((84,), d)},
        "fc3": {"w": he_uniform(ks[4], (84, cfg.num_classes), fan_in=84, dtype=d),
                "b": jnp.zeros((cfg.num_classes,), d)},
    }


def lenet_forward(params: Params, x: jnp.ndarray, cfg: LeNetConfig = LeNetConfig(), taps: bool = False):
    """x: [B, 28, 28, C] (padded internally to 32) -> logits [B, classes]."""
    t = {}
    if x.shape[1] == 28:
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    y = relu(conv2d(x, params["conv1"]["w"], bias=params["conv1"]["b"]))
    y = avgpool2d(y, 2, 2)
    if taps:
        t["conv1"] = y
    y = relu(conv2d(y, params["conv2"]["w"], bias=params["conv2"]["b"]))
    y = avgpool2d(y, 2, 2)
    if taps:
        t["conv2"] = y
    y = y.reshape(y.shape[0], -1)
    y = relu(dense(y, params["fc1"]["w"], params["fc1"]["b"]))
    y = relu(dense(y, params["fc2"]["w"], params["fc2"]["b"]))
    logits = dense(y, params["fc3"]["w"], params["fc3"]["b"])
    if taps:
        t["logits"] = logits
        return logits, t
    return logits


def flatten_params(params: Params) -> Params:
    """Flat quantization sites (BASELINE config 1: per-tensor INT8 PTQ)."""
    return {k: {"w": v["w"], "b": v["b"]} for k, v in params.items()}


def qforward(ctx, x: jnp.ndarray, cfg: LeNetConfig = LeNetConfig(), taps: bool = False):
    t = {}
    if x.ndim == 2:  # flat MNIST rows -> images
        x = x.reshape(x.shape[0], 28, 28, cfg.in_channels)
    if x.shape[1] == 28:
        x = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    y = avgpool2d(ctx.conv("conv1", x, fuse_relu=True), 2, 2)
    if taps:
        t["conv1"] = y
    y = avgpool2d(ctx.conv("conv2", y, fuse_relu=True), 2, 2)
    if taps:
        t["conv2"] = y
    y = y.reshape(y.shape[0], -1)
    y = ctx.dense("fc1", y, fuse_relu=True)
    y = ctx.dense("fc2", y, fuse_relu=True)
    logits = ctx.dense("fc3", y)
    if taps:
        t["logits"] = logits
        return logits, t
    return logits


@register("lenet5")
def _build_lenet(**kw):
    cfg = LeNetConfig(**kw)
    return cfg, init_lenet, lenet_forward

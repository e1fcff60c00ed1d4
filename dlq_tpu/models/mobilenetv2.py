"""MobileNetV2 (BASELINE config 4): the depthwise-conv stress model for
fused dequant+conv kernels.

Standard inverted-residual topology: stem conv3x3/s2 -> 17 inverted residual
blocks (expand 1x1 -> depthwise 3x3 -> project 1x1, residual when stride 1
and cin==cout) -> head conv1x1(1280) -> GAP -> FC. ReLU6 activations.
NHWC/HWIO throughout; depthwise = feature_group_count conv.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from dlq_tpu.models.registry import register
from dlq_tpu.models.common import (
    batchnorm_inference,
    conv2d,
    dense,
    fold_bn,
    global_avgpool,
    init_bn,
    kaiming_normal,
)

Params = Dict[str, Any]

# (expansion t, out channels c, repeats n, stride s) — MobileNetV2 paper table 2
_BLOCKS: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)


@dataclasses.dataclass(frozen=True)
class MobileNetV2Config:
    num_classes: int = 1000
    in_channels: int = 3
    width_mult: float = 1.0
    small_input: bool = False  # CIFAR variant: stem stride 1
    dtype: Any = jnp.float32

    def ch(self, c: int) -> int:
        v = int(c * self.width_mult + 4) // 8 * 8
        return max(8, v)


def relu6(x):
    return jnp.clip(x, 0, 6)


def _init_conv_bn(key, kh, kw, cin, cout, dtype, groups=1):
    fan_out = kh * kw * cout // groups
    return {
        "w": kaiming_normal(key, (kh, kw, cin // groups, cout), fan_out=fan_out, dtype=dtype),
        "bn": init_bn(cout, dtype),
    }


def block_meta(cfg: MobileNetV2Config) -> List[Dict[str, Any]]:
    """STATIC per-block topology (never goes in the traced param pytree):
    stride, residual, expansion presence, channel counts."""
    meta: List[Dict[str, Any]] = []
    cin = cfg.ch(32)
    for t, c, n, s in _BLOCKS:
        cout = cfg.ch(c)
        for i in range(n):
            stride = s if i == 0 else 1
            meta.append({
                "stride": stride,
                "has_res": stride == 1 and cin == cout,
                "expand": t != 1,
                "cin": cin, "cout": cout, "hidden": cin * t,
            })
            cin = cout
    return meta


def init_mobilenetv2(key, cfg: MobileNetV2Config) -> Params:
    keys = iter(jax.random.split(key, 64))
    d = cfg.dtype
    params: Params = {
        "stem": _init_conv_bn(next(keys), 3, 3, cfg.in_channels, cfg.ch(32), d)
    }
    blocks: List[Params] = []
    for m in block_meta(cfg):
        bp: Params = {}
        if m["expand"]:
            bp["expand"] = _init_conv_bn(next(keys), 1, 1, m["cin"], m["hidden"], d)
        bp["dw"] = _init_conv_bn(next(keys), 3, 3, m["hidden"], m["hidden"], d, groups=m["hidden"])
        bp["project"] = _init_conv_bn(next(keys), 1, 1, m["hidden"], m["cout"], d)
        blocks.append(bp)
    params["blocks"] = blocks
    cin = block_meta(cfg)[-1]["cout"]
    params["head"] = _init_conv_bn(next(keys), 1, 1, cin, cfg.ch(1280), d)
    chead = cfg.ch(1280)
    bound = 1.0 / (chead ** 0.5)
    params["fc"] = {
        "w": jax.random.uniform(next(keys), (chead, cfg.num_classes), d, -bound, bound),
        "b": jnp.zeros((cfg.num_classes,), d),
    }
    return params


def _conv_bn_act(x, p, stride=1, padding=0, groups=1, act=True):
    y = conv2d(x, p["w"], stride=stride, padding=padding, groups=groups)
    y = batchnorm_inference(y, p["bn"])
    return relu6(y) if act else y


def mobilenetv2_forward(params: Params, x: jnp.ndarray, cfg: MobileNetV2Config, taps: bool = False):
    t: Dict[str, jnp.ndarray] = {}
    y = _conv_bn_act(x, params["stem"], stride=1 if cfg.small_input else 2, padding=1)
    if taps:
        t["stem"] = y
    for i, (bp, m) in enumerate(zip(params["blocks"], block_meta(cfg))):
        inp = y
        if "expand" in bp:
            y = _conv_bn_act(y, bp["expand"])
        y = _conv_bn_act(y, bp["dw"], stride=m["stride"], padding=1, groups=m["hidden"])
        y = _conv_bn_act(y, bp["project"], act=False)
        if m["has_res"]:
            y = y + inp
        if taps:
            t[f"block{i}"] = y
    y = _conv_bn_act(y, params["head"])
    g = global_avgpool(y)
    logits = dense(g, params["fc"]["w"], params["fc"]["b"])
    if taps:
        t["gap"], t["logits"] = g, logits
        return logits, t
    return logits


def mobilenetv2_forward_train(params: Params, x: jnp.ndarray,
                              cfg: MobileNetV2Config):
    """Training-mode forward: BN uses BATCH statistics (models/common.py
    batchnorm_train — same fix as resnet_forward_train: training through
    inference BN at init stats collapses an 18+-layer net). Returns
    (logits, bn_stats) where bn_stats maps each conv-bn site to its
    (batch_mean, batch_var); feed to apply_bn_updates after the step."""
    from dlq_tpu.models.common import batchnorm_train

    stats: Dict[str, Any] = {}

    def cba(y, p, key, stride=1, padding=0, groups=1, act=True):
        y = conv2d(y, p["w"], stride=stride, padding=padding, groups=groups)
        y, s = batchnorm_train(y, p["bn"])
        stats[key] = s
        return relu6(y) if act else y

    y = cba(x, params["stem"], "stem",
            stride=1 if cfg.small_input else 2, padding=1)
    for i, (bp, m) in enumerate(zip(params["blocks"], block_meta(cfg))):
        inp = y
        if "expand" in bp:
            y = cba(y, bp["expand"], f"block{i}.expand")
        y = cba(y, bp["dw"], f"block{i}.dw", stride=m["stride"], padding=1,
                groups=m["hidden"])
        y = cba(y, bp["project"], f"block{i}.project", act=False)
        if m["has_res"]:
            y = y + inp
    y = cba(y, params["head"], "head")
    g = global_avgpool(y)
    logits = dense(g, params["fc"]["w"], params["fc"]["b"])
    return logits, stats


def apply_bn_updates(params: Params, stats: Dict[str, Any], n: int,
                     momentum: float = 0.1) -> Params:
    """EMA running-stat update for every BN site touched by
    mobilenetv2_forward_train (mirrors resnet.apply_bn_updates)."""
    from dlq_tpu.models.common import update_bn_stats

    def holder(path: str) -> Params:
        if path in ("stem", "head"):
            return params[path]
        blk, leaf = path.split(".")
        return params["blocks"][int(blk[5:])][leaf]

    for path, s in stats.items():
        h = holder(path)
        h["bn"] = update_bn_stats(h["bn"], s, momentum, n)
    return params


# ---------------------------------------------------------------------------
# folded / quantized path
# ---------------------------------------------------------------------------

def fold_mobilenetv2(params: Params) -> Params:
    """Fold BN into convs -> flat {site: {w,b,(meta)}} for the quantizer."""
    flat: Params = {}

    def fold(name, p):
        w, b = fold_bn(p["w"], None, p["bn"])
        flat[name] = {"w": w, "b": b}

    fold("stem", params["stem"])
    for i, bp in enumerate(params["blocks"]):
        if "expand" in bp:
            fold(f"block{i}.expand", bp["expand"])
        fold(f"block{i}.dw", bp["dw"])
        fold(f"block{i}.project", bp["project"])
    fold("head", params["head"])
    flat["fc"] = {"w": params["fc"]["w"], "b": params["fc"]["b"]}
    return flat


def make_qforward(meta: List[Dict[str, Any]]):
    """Build the ctx-based quantized forward for a given topology.

    Depthwise convs quantize weights per-channel but run via the grouped-conv
    int8 path; ReLU6 stays in the fp32 interchange (clip fuses into the
    rescale epilogue under XLA).
    """

    def qforward(ctx, x, cfg, taps: bool = False):
        t: Dict[str, jnp.ndarray] = {}
        y = relu6(ctx.conv("stem", x, stride=1 if cfg.small_input else 2, padding=1))
        for i, m in enumerate(meta):
            inp = y
            if m["expand"]:
                y = relu6(ctx.conv(f"block{i}.expand", y))
            y = relu6(ctx.conv(f"block{i}.dw", y, stride=m["stride"], padding=1, groups=m["hidden"]))
            y = ctx.conv(f"block{i}.project", y)
            if m["has_res"]:
                y = y + inp
            if taps:
                t[f"block{i}"] = y
        y = relu6(ctx.conv("head", y))
        g = global_avgpool(y)
        logits = ctx.dense("fc", g)
        if taps:
            t["gap"], t["logits"] = g, logits
            return logits, t
        return logits

    return qforward


def make_qforward_fused(meta: List[Dict[str, Any]]):
    """Fully-int8 interchange MobileNetV2 (use with FullFusedCtx): every

    STATUS: CPU-validated (cosine 0.998 vs DeployCtx); on the axon TPU
    backend this path triggers the int8-epilogue miscompile family
    (finite-but-wrong outputs) and measures slower than DeployCtx — use
    DeployCtx for MobileNetV2 deployment on TPU (BENCH_NOTES.md).

    expand/dw/project tensor travels int8 with relu6 folded into the
    requantizing epilogue; residual adds use shared-scale int arithmetic.
    The consumer-scale chain: expand feeds dw, dw feeds project, project
    feeds the next block's first conv (or head)."""

    def next_site(i: int) -> str:
        if i + 1 < len(meta):
            return f"block{i+1}.expand" if meta[i + 1]["expand"] else f"block{i+1}.dw"
        return "head"

    def qforward(ctx, x, cfg, taps: bool = False):
        t: Dict[str, jnp.ndarray] = {}
        first = "block0.expand" if meta[0]["expand"] else "block0.dw"
        y = ctx.conv("stem", x, stride=1 if cfg.small_input else 2, padding=1,
                     fuse_relu6=True, out_site=first)
        for i, m in enumerate(meta):
            inp = y
            nxt = next_site(i)
            if m["expand"]:
                y = ctx.conv(f"block{i}.expand", y, fuse_relu6=True,
                             out_site=f"block{i}.dw")
            y = ctx.conv(f"block{i}.dw", y, stride=m["stride"], padding=1,
                         groups=m["hidden"], fuse_relu6=True,
                         out_site=f"block{i}.project")
            y = ctx.conv(f"block{i}.project", y, out_site=nxt)
            if m["has_res"]:
                y = ctx.add(y, ctx.requant(inp, nxt))
            if taps:
                t[f"block{i}"] = y.q.astype(jnp.float32) * y.scale
        y = ctx.conv("head", y, fuse_relu6=True, out_site="fc")
        logits = ctx.gap_dense("fc", y)
        if taps:
            t["logits"] = logits
            return logits, t
        return logits

    return qforward


@register("mobilenetv2")
def _build_mnv2(**kw):
    cfg = MobileNetV2Config(**kw)
    return cfg, init_mobilenetv2, mobilenetv2_forward

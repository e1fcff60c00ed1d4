"""ResNet-18/34 as pure functional JAX (NHWC), with per-stage taps.

Topology semantics from the reference's e2e engine: stem conv7x7/s2/p3 ->
bn -> relu -> maxpool3x3/s2/p1, then 4 stages of BasicBlocks where the first
block of stages 2-4 strides and takes a 1x1/s2 conv+BN downsample shortcut,
then GAP -> FC (`runtime/infer_e2e.cu:139-203,258-432`). Re-designed as one
jit-compiled function parameterized by config instead of per-step binaries.

``taps=True`` returns every stage checkpoint (stem, layer1..4, gap, logits),
replacing the reference's ``--dump_dir`` stage-bisection workflow
(`infer_e2e.cu:243-248`) and feeding the fixture-parity pytest ladder.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp

from dlq_tpu.models.registry import register
from dlq_tpu.models.common import (
    BN_EPS,
    batchnorm_inference,
    conv2d,
    dense,
    fold_bn,
    global_avgpool,
    init_bn,
    kaiming_normal,
    maxpool2d,
    relu,
)

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ResNetConfig:
    depth: int = 18
    num_classes: int = 1000
    in_channels: int = 3
    widths: Tuple[int, ...] = (64, 128, 256, 512)
    # CIFAR variant: 3x3/s1 stem, no maxpool (BASELINE config 2)
    small_input: bool = False
    dtype: Any = jnp.float32

    @property
    def blocks_per_stage(self) -> Tuple[int, ...]:
        return {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
                101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}[self.depth]

    @property
    def bottleneck(self) -> bool:
        return self.depth >= 50

    @property
    def expansion(self) -> int:
        return 4 if self.bottleneck else 1


def _init_block(key, cin: int, cout: int, stride: int, dtype) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    p: Params = {
        "conv1": kaiming_normal(k1, (3, 3, cin, cout), fan_out=9 * cout, dtype=dtype),
        "bn1": init_bn(cout, dtype),
        "conv2": kaiming_normal(k2, (3, 3, cout, cout), fan_out=9 * cout, dtype=dtype),
        "bn2": init_bn(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = kaiming_normal(k3, (1, 1, cin, cout), fan_out=cout, dtype=dtype)
        p["down_bn"] = init_bn(cout, dtype)
    return p


def _init_bottleneck(key, cin: int, width: int, stride: int, dtype) -> Params:
    """1x1 reduce -> 3x3 -> 1x1 expand(x4), torchvision Bottleneck layout."""
    cout = width * 4
    k1, k2, k3, k4 = jax.random.split(key, 4)
    p: Params = {
        "conv1": kaiming_normal(k1, (1, 1, cin, width), fan_out=width, dtype=dtype),
        "bn1": init_bn(width, dtype),
        "conv2": kaiming_normal(k2, (3, 3, width, width), fan_out=9 * width, dtype=dtype),
        "bn2": init_bn(width, dtype),
        "conv3": kaiming_normal(k3, (1, 1, width, cout), fan_out=cout, dtype=dtype),
        "bn3": init_bn(cout, dtype),
    }
    if stride != 1 or cin != cout:
        p["down_conv"] = kaiming_normal(k4, (1, 1, cin, cout), fan_out=cout, dtype=dtype)
        p["down_bn"] = init_bn(cout, dtype)
    return p


def init_resnet(key, cfg: ResNetConfig) -> Params:
    keys = jax.random.split(key, 2 + len(cfg.widths))
    dtype = cfg.dtype
    if cfg.small_input:
        stem_w = kaiming_normal(keys[0], (3, 3, cfg.in_channels, cfg.widths[0]),
                                fan_out=9 * cfg.widths[0], dtype=dtype)
    else:
        stem_w = kaiming_normal(keys[0], (7, 7, cfg.in_channels, cfg.widths[0]),
                                fan_out=49 * cfg.widths[0], dtype=dtype)
    params: Params = {"stem": {"conv": stem_w, "bn": init_bn(cfg.widths[0], dtype)}}
    cin = cfg.widths[0]
    for s, (width, nblocks) in enumerate(zip(cfg.widths, cfg.blocks_per_stage)):
        bkeys = jax.random.split(keys[1 + s], nblocks)
        blocks: List[Params] = []
        for b in range(nblocks):
            stride = 2 if (s > 0 and b == 0) else 1
            if cfg.bottleneck:
                blocks.append(_init_bottleneck(bkeys[b], cin, width, stride, dtype))
                cin = width * 4
            else:
                blocks.append(_init_block(bkeys[b], cin, width, stride, dtype))
                cin = width
        params[f"layer{s+1}"] = blocks
    kfc = keys[-1]
    bound = 1.0 / (cin ** 0.5)
    params["fc"] = {
        "w": jax.random.uniform(kfc, (cin, cfg.num_classes), dtype, -bound, bound),
        "b": jnp.zeros((cfg.num_classes,), dtype),
    }
    return params


def bottleneck_block(x: jnp.ndarray, p: Params, stride: int, eps: float = BN_EPS) -> jnp.ndarray:
    """1x1->bn->relu -> 3x3(stride)->bn->relu -> 1x1->bn (+shortcut) ->relu."""
    y = relu(batchnorm_inference(conv2d(x, p["conv1"]), p["bn1"], eps))
    y = relu(batchnorm_inference(conv2d(y, p["conv2"], stride=stride, padding=1), p["bn2"], eps))
    y = batchnorm_inference(conv2d(y, p["conv3"]), p["bn3"], eps)
    if "down_conv" in p:
        sc = batchnorm_inference(conv2d(x, p["down_conv"], stride=stride), p["down_bn"], eps)
    else:
        sc = x
    return relu(y + sc)


def basic_block(x: jnp.ndarray, p: Params, stride: int, eps: float = BN_EPS) -> jnp.ndarray:
    """conv3x3->bn->relu->conv3x3->bn (+ optional 1x1/s2 conv+bn shortcut)
    ->add->relu — semantics of basic_block_forward, infer_e2e.cu:156-203."""
    y = conv2d(x, p["conv1"], stride=stride, padding=1)
    y = relu(batchnorm_inference(y, p["bn1"], eps))
    y = conv2d(y, p["conv2"], stride=1, padding=1)
    y = batchnorm_inference(y, p["bn2"], eps)
    if "down_conv" in p:
        sc = conv2d(x, p["down_conv"], stride=stride, padding=0)
        sc = batchnorm_inference(sc, p["down_bn"], eps)
    else:
        sc = x
    return relu(y + sc)


def resnet_forward(
    params: Params,
    x: jnp.ndarray,
    cfg: ResNetConfig,
    taps: bool = False,
):
    """NHWC input -> logits. With taps, also return stage checkpoints."""
    t: Dict[str, jnp.ndarray] = {}
    if cfg.small_input:
        y = conv2d(x, params["stem"]["conv"], stride=1, padding=1)
    else:
        y = conv2d(x, params["stem"]["conv"], stride=2, padding=3)
    y = relu(batchnorm_inference(y, params["stem"]["bn"]))
    if not cfg.small_input:
        y = maxpool2d(y, 3, 2, 1)
    if taps:
        t["stem"] = y
    block_fn = bottleneck_block if cfg.bottleneck else basic_block
    for s in range(4):
        blocks = params[f"layer{s+1}"]
        for b, bp in enumerate(blocks):
            stride = 2 if (s > 0 and b == 0) else 1
            y = block_fn(y, bp, stride)
        if taps:
            t[f"layer{s+1}"] = y
    g = global_avgpool(y)
    if taps:
        t["gap"] = g
    logits = dense(g, params["fc"]["w"], params["fc"]["b"])
    if taps:
        t["logits"] = logits
        return logits, t
    return logits


def resnet_forward_train(params: Params, x: jnp.ndarray, cfg: ResNetConfig):
    """Training-mode forward: BN uses batch statistics (models/common.py
    batchnorm_train). Returns (logits, bn_stats) where bn_stats maps each BN
    site path to its (batch_mean, batch_var) — feed to apply_bn_updates
    after the gradient step. Same topology as resnet_forward; the running
    mean/var in params do not enter this forward."""
    from dlq_tpu.models.common import batchnorm_train

    stats: Dict[str, Any] = {}

    def bn_t(y, bn, key):
        y, s = batchnorm_train(y, bn)
        stats[key] = s
        return y

    if cfg.small_input:
        y = conv2d(x, params["stem"]["conv"], stride=1, padding=1)
    else:
        y = conv2d(x, params["stem"]["conv"], stride=2, padding=3)
    y = relu(bn_t(y, params["stem"]["bn"], "stem.bn"))
    if not cfg.small_input:
        y = maxpool2d(y, 3, 2, 1)
    for s in range(4):
        for b, p in enumerate(params[f"layer{s+1}"]):
            stride = 2 if (s > 0 and b == 0) else 1
            pre = f"layer{s+1}.{b}"
            if cfg.bottleneck:
                z = relu(bn_t(conv2d(y, p["conv1"]), p["bn1"], f"{pre}.bn1"))
                z = relu(bn_t(conv2d(z, p["conv2"], stride=stride, padding=1),
                              p["bn2"], f"{pre}.bn2"))
                z = bn_t(conv2d(z, p["conv3"]), p["bn3"], f"{pre}.bn3")
            else:
                z = relu(bn_t(conv2d(y, p["conv1"], stride=stride, padding=1),
                              p["bn1"], f"{pre}.bn1"))
                z = bn_t(conv2d(z, p["conv2"], stride=1, padding=1),
                         p["bn2"], f"{pre}.bn2")
            if "down_conv" in p:
                sc = bn_t(conv2d(y, p["down_conv"], stride=stride),
                          p["down_bn"], f"{pre}.down_bn")
            else:
                sc = y
            y = relu(z + sc)
    g = global_avgpool(y)
    return dense(g, params["fc"]["w"], params["fc"]["b"]), stats


def apply_bn_updates(params: Params, stats: Dict[str, Any], n: int,
                     momentum: float = 0.1) -> Params:
    """EMA running-stat update for every BN site touched by
    resnet_forward_train. `n` = the reduce count (batch * H * W per site is
    unknown here, so pass batch size only for the unbiased-var correction's
    n — with image batches n is large enough that biased vs unbiased is
    negligible; torch uses the full reduce count)."""
    from dlq_tpu.models.common import update_bn_stats

    def site(path: str):
        head, leaf = path.rsplit(".", 1)
        if head == "stem":
            return params["stem"], leaf
        layer, idx = head.split(".")
        return params[layer][int(idx)], leaf

    for path, s in stats.items():
        holder, leaf = site(path)
        holder[leaf] = update_bn_stats(holder[leaf], s, momentum, n)
    return params


def fold_resnet(params: Params, cfg: ResNetConfig) -> Params:
    """Fold every inference BN into its conv -> {conv: (w, b)} deployment
    params. This is the input to the quantizer."""
    out: Params = {}
    w, b = fold_bn(params["stem"]["conv"], None, params["stem"]["bn"])
    out["stem"] = {"w": w, "b": b}
    for s in range(4):
        blocks = []
        for bp in params[f"layer{s+1}"]:
            fb: Params = {}
            fb["conv1_w"], fb["conv1_b"] = fold_bn(bp["conv1"], None, bp["bn1"])
            fb["conv2_w"], fb["conv2_b"] = fold_bn(bp["conv2"], None, bp["bn2"])
            if "conv3" in bp:
                fb["conv3_w"], fb["conv3_b"] = fold_bn(bp["conv3"], None, bp["bn3"])
            if "down_conv" in bp:
                fb["down_w"], fb["down_b"] = fold_bn(bp["down_conv"], None, bp["down_bn"])
            blocks.append(fb)
        out[f"layer{s+1}"] = blocks
    out["fc"] = {"w": params["fc"]["w"], "b": params["fc"]["b"]}
    return out


def folded_forward(folded: Params, x: jnp.ndarray, cfg: ResNetConfig, taps: bool = False):
    """Forward through BN-folded params — the deployment fp32/bf16 path and
    the structural template the quantized engine mirrors."""
    t: Dict[str, jnp.ndarray] = {}
    stem = folded["stem"]
    if cfg.small_input:
        y = conv2d(x, stem["w"], stride=1, padding=1, bias=stem["b"])
    else:
        y = conv2d(x, stem["w"], stride=2, padding=3, bias=stem["b"])
    y = relu(y)
    if not cfg.small_input:
        y = maxpool2d(y, 3, 2, 1)
    if taps:
        t["stem"] = y
    for s in range(4):
        for b, fb in enumerate(folded[f"layer{s+1}"]):
            stride = 2 if (s > 0 and b == 0) else 1
            if "conv3_w" in fb:  # bottleneck
                z = relu(conv2d(y, fb["conv1_w"], bias=fb["conv1_b"]))
                z = relu(conv2d(z, fb["conv2_w"], stride=stride, padding=1, bias=fb["conv2_b"]))
                z = conv2d(z, fb["conv3_w"], bias=fb["conv3_b"])
            else:
                z = relu(conv2d(y, fb["conv1_w"], stride=stride, padding=1, bias=fb["conv1_b"]))
                z = conv2d(z, fb["conv2_w"], stride=1, padding=1, bias=fb["conv2_b"])
            if "down_w" in fb:
                sc = conv2d(y, fb["down_w"], stride=stride, padding=0, bias=fb["down_b"])
            else:
                sc = y
            y = relu(z + sc)
        if taps:
            t[f"layer{s+1}"] = y
    g = global_avgpool(y)
    logits = dense(g, folded["fc"]["w"], folded["fc"]["b"])
    if taps:
        t["gap"], t["logits"] = g, logits
        return logits, t
    return logits


def flatten_folded(folded: Params) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Nested folded params -> flat {site: {"w", "b"}} for the quantizer."""
    flat: Dict[str, Dict[str, jnp.ndarray]] = {"stem": {"w": folded["stem"]["w"], "b": folded["stem"]["b"]}}
    for s in range(4):
        for b, fb in enumerate(folded[f"layer{s+1}"]):
            flat[f"layer{s+1}.{b}.conv1"] = {"w": fb["conv1_w"], "b": fb["conv1_b"]}
            flat[f"layer{s+1}.{b}.conv2"] = {"w": fb["conv2_w"], "b": fb["conv2_b"]}
            if "conv3_w" in fb:
                flat[f"layer{s+1}.{b}.conv3"] = {"w": fb["conv3_w"], "b": fb["conv3_b"]}
            if "down_w" in fb:
                flat[f"layer{s+1}.{b}.down"] = {"w": fb["down_w"], "b": fb["down_b"]}
    flat["fc"] = {"w": folded["fc"]["w"], "b": folded["fc"]["b"]}
    return flat


def qforward(ctx, x: jnp.ndarray, cfg: ResNetConfig, taps: bool = False):
    """The ONE quantized-topology definition, shared by observe / deploy /
    simulate contexts (dlq_tpu.quant.model_quant). Residual adds stay in
    the fp32/bf16 interchange dtype; convs/fc quantize at their inputs."""
    t: Dict[str, jnp.ndarray] = {}
    if cfg.small_input:
        y = ctx.conv("stem", x, stride=1, padding=1, fuse_relu=True)
    else:
        y = ctx.conv("stem", x, stride=2, padding=3, fuse_relu=True)
        y = maxpool2d(y, 3, 2, 1)
    if taps:
        t["stem"] = y
    nblocks = cfg.blocks_per_stage
    for s in range(4):
        for b in range(nblocks[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            site = f"layer{s+1}.{b}"
            if cfg.bottleneck:
                z = ctx.conv(f"{site}.conv1", y, fuse_relu=True)
                z = ctx.conv(f"{site}.conv2", z, stride=stride, padding=1, fuse_relu=True)
                z = ctx.conv(f"{site}.conv3", z)
            else:
                z = ctx.conv(f"{site}.conv1", y, stride=stride, padding=1, fuse_relu=True)
                z = ctx.conv(f"{site}.conv2", z, stride=1, padding=1)
            down = f"{site}.down"
            sc = ctx.conv(down, y, stride=stride, padding=0) if ctx.has(down) else y
            y = relu(z + sc)
        if taps:
            t[f"layer{s+1}"] = y
    g = global_avgpool(y)
    logits = ctx.dense("fc", g)
    if taps:
        t["gap"], t["logits"] = g, logits
        return logits, t
    return logits


def qforward_fused(ctx, x: jnp.ndarray, cfg: ResNetConfig, taps: bool = False):
    """INT8-interchange deploy topology (use with FusedDeployCtx).

    Semantics-identical to `qforward`+DeployCtx — the same quantize-at-
    consumer-scale decisions — but activations travel int8 inside each
    BasicBlock (conv1 emits the int8 tensor conv2 consumes, requantization
    fused in the conv epilogue); only block-boundary tensors (residual adds)
    stay fp32. The 1x1 downsample shares conv1's quantized input (same
    tensor => same calibrated scale).
    """
    t: Dict[str, jnp.ndarray] = {}
    nb = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}[cfg.depth]
    if cfg.small_input:
        y = ctx.conv("stem", x, stride=1, padding=1, fuse_relu=True)
    else:
        y = ctx.conv("stem", x, stride=2, padding=3, fuse_relu=True)
        y = maxpool2d(y, 3, 2, 1)
    if taps:
        t["stem"] = y
    for s in range(4):
        for b in range(nb[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            site = f"layer{s+1}.{b}"
            yq = ctx.quant(f"{site}.conv1", y)
            z = ctx.conv(f"{site}.conv1", yq, stride=stride, padding=1,
                         fuse_relu=True, out_site=f"{site}.conv2")
            z = ctx.conv(f"{site}.conv2", z, stride=1, padding=1)
            down = f"{site}.down"
            sc = ctx.conv(down, yq, stride=stride, padding=0) if ctx.has(down) else y
            y = relu(z + sc)
        if taps:
            t[f"layer{s+1}"] = y
    g = global_avgpool(y)
    logits = ctx.dense("fc", g)
    if taps:
        t["gap"], t["logits"] = g, logits
        return logits, t
    return logits


def qforward_fused2(ctx, x: jnp.ndarray, cfg: ResNetConfig, taps: bool = False,
                    s2d_stem: bool = False, stem_bf16: bool = True):
    """FULLY-int8 interchange topology (use with FullFusedCtx): stem,
    maxpool, every block tensor, and the residual junctions are int8; the
    only fp32 tensors are the input, the pooled feature vector, and logits.
    Residual adds use TFLite-style shared-scale int arithmetic (small,
    measured accuracy delta vs DeployCtx)."""
    t: Dict[str, jnp.ndarray] = {}
    nb = cfg.blocks_per_stage
    first = "layer1.0.conv1"
    if cfg.small_input:
        y = ctx.conv("stem", x, stride=1, padding=1, fuse_relu=True, out_site=first)
    else:
        if x.dtype == jnp.uint8 and hasattr(ctx, "conv_stem_bf16_u8"):
            # raw-uint8 ingest: preprocessing folded into the stem
            y = ctx.conv_stem_bf16_u8("stem", x, out_site=first)
        elif stem_bf16:
            y = ctx.conv_stem_bf16("stem", x, out_site=first)
        elif s2d_stem and x.shape[1] % 2 == 0:
            y = ctx.conv_stem_s2d("stem", x, out_site=first)
        else:
            y = ctx.conv("stem", x, stride=2, padding=3, fuse_relu=True, out_site=first)
        y = ctx.maxpool(y, 3, 2, 1)
    if taps:
        t["stem"] = y.q.astype(jnp.float32) * y.scale
    for s in range(4):
        for b in range(nb[s]):
            stride = 2 if (s > 0 and b == 0) else 1
            site = f"layer{s+1}.{b}"
            # the junction scale: next consumer's calibrated input scale
            if b + 1 < nb[s]:
                nxt = f"layer{s+1}.{b+1}.conv1"
            elif s < 3:
                nxt = f"layer{s+2}.0.conv1"
            else:
                # the final junction has no conv consumer whose calibrated
                # input scale covers the UNpooled activations (the fc site
                # is calibrated on the gap output, whose amax is smaller —
                # requantizing with it would clip); keep this one junction
                # fp32 (a single 7x7 tensor, negligible traffic)
                nxt = None
            down = f"{site}.down"
            if (nxt is not None and stride == 1 and not ctx.has(down)
                    and getattr(ctx, "fused_block", None) is not None
                    and hasattr(y, "q")):
                fb = ctx.fused_block(site, y, nxt)
                if fb is not None:
                    y = fb
                    continue
            if cfg.bottleneck:
                z = ctx.conv(f"{site}.conv1", y, fuse_relu=True,
                             out_site=f"{site}.conv2")
                z = ctx.conv(f"{site}.conv2", z, stride=stride, padding=1,
                             fuse_relu=True, out_site=f"{site}.conv3")
                z = ctx.conv(f"{site}.conv3", z, out_site=nxt)
            else:
                z = ctx.conv(f"{site}.conv1", y, stride=stride, padding=1,
                             fuse_relu=True, out_site=f"{site}.conv2")
                z = ctx.conv(f"{site}.conv2", z, stride=1, padding=1, out_site=nxt)
            if nxt is None:
                from dlq_tpu.quant.model_quant import QAct as _QAct

                sc = (ctx.conv(down, y, stride=stride, padding=0)
                      if ctx.has(down) else y.q.astype(jnp.float32) * y.scale)
                y = relu(z + sc)
            else:
                sc = (ctx.conv(down, y, stride=stride, padding=0, out_site=nxt)
                      if ctx.has(down) else ctx.requant(y, nxt))
                y = ctx.add_relu(z, sc)
        if taps:
            t[f"layer{s+1}"] = (y.q.astype(jnp.float32) * y.scale
                                 if hasattr(y, "q") else y)
    logits = ctx.gap_dense("fc", y) if hasattr(y, "q") else ctx.dense(
        "fc", global_avgpool(y))
    if taps:
        t["logits"] = logits
        return logits, t
    return logits


@register("resnet18")
def _build_resnet18(**kw):
    cfg = ResNetConfig(depth=18, **kw)
    return cfg, init_resnet, resnet_forward


@register("resnet34")
def _build_resnet34(**kw):
    cfg = ResNetConfig(depth=34, **kw)
    return cfg, init_resnet, resnet_forward


@register("resnet50")
def _build_resnet50(**kw):
    cfg = ResNetConfig(depth=50, **kw)
    return cfg, init_resnet, resnet_forward


@register("resnet101")
def _build_resnet101(**kw):
    cfg = ResNetConfig(depth=101, **kw)
    return cfg, init_resnet, resnet_forward


@register("resnet152")
def _build_resnet152(**kw):
    cfg = ResNetConfig(depth=152, **kw)
    return cfg, init_resnet, resnet_forward

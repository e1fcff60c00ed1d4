"""Tiny ViT / DeiT-Ti (BASELINE config 5): quantized attention projections
+ per-layer error logging harness.

Standard ViT: patchify conv(p=16) -> +cls token +learned pos embed ->
L x [LN -> MHSA -> res -> LN -> MLP(GELU) -> res] -> LN -> head on cls.
DeiT-Ti: dim 192, 12 layers, 3 heads, mlp ratio 4.

Quantization surface: every dense projection (qkv, attn out, mlp fc1/fc2,
head) goes through ctx.dense sites -> W8A8 on the MXU. The softmax(QK^T)V
matmuls stay in the fp32/bf16 interchange: they are small (seq 197) and
sit between two quantization boundaries already; per-layer error logging
(quant/error_report) shows whether they ever dominate the error budget.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from dlq_tpu.models.registry import register
from dlq_tpu.models.common import dense

Params = Dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch: int = 16
    dim: int = 192
    depth: int = 12
    heads: int = 3
    mlp_ratio: int = 4
    num_classes: int = 1000
    in_channels: int = 3
    dtype: Any = jnp.float32
    # "xla": jnp einsum attention (scores tensor materializes in HBM);
    # "fused": Pallas fused-softmax attention (ops/pallas_attention.py) —
    # the TPU deploy path; falls back to interpret mode on CPU.
    attn_impl: str = "xla"
    # fused residual+LayerNorm Pallas kernels (ops/pallas_layernorm.py).
    # 4.8x faster than XLA's LN in isolation, but measured SLOWER in the
    # full forward (the pallas_call boundary stops XLA fusing the LN into
    # its producer/consumer, which it does in the full graph) — keep False
    # unless the surrounding graph is already kernel-bounded. Measurements
    # in BENCH_NOTES.md.
    fused_ln: bool = False
    # exact erf GELU costs 5.8 ms/batch-256 on the VPU (73% of the MLP
    # stack); the tanh approximation fuses into the matmul for free.
    # "exact" for torch-oracle parity, "tanh" for deployment (max activation
    # error ~3e-3, far under int8 quantization noise — gated by the
    # error-report harness).
    gelu: str = "exact"

    @property
    def seq_len(self) -> int:
        return (self.image_size // self.patch) ** 2 + 1  # +cls


def _trunc_normal(key, shape, std, dtype):
    return std * jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(dtype)


def init_vit(key, cfg: ViTConfig) -> Params:
    d = cfg.dtype
    D = cfg.dim
    keys = iter(jax.random.split(key, 8 + 8 * cfg.depth))
    params: Params = {
        # patchify as a dense over flattened patches (p*p*C, D): TPU-friendlier
        # than a big-stride conv, identical math
        "patch": {"w": _trunc_normal(next(keys), (cfg.patch * cfg.patch * cfg.in_channels, D), 0.02, d),
                  "b": jnp.zeros((D,), d)},
        "cls": _trunc_normal(next(keys), (1, 1, D), 0.02, d),
        "pos": _trunc_normal(next(keys), (1, cfg.seq_len, D), 0.02, d),
        "norm": {"g": jnp.ones((D,), d), "b": jnp.zeros((D,), d)},
        "head": {"w": _trunc_normal(next(keys), (D, cfg.num_classes), 0.02, d),
                 "b": jnp.zeros((cfg.num_classes,), d)},
    }
    layers = []
    H = cfg.mlp_ratio * D
    for _ in range(cfg.depth):
        layers.append({
            "ln1": {"g": jnp.ones((D,), d), "b": jnp.zeros((D,), d)},
            "qkv": {"w": _trunc_normal(next(keys), (D, 3 * D), 0.02, d), "b": jnp.zeros((3 * D,), d)},
            "proj": {"w": _trunc_normal(next(keys), (D, D), 0.02, d), "b": jnp.zeros((D,), d)},
            "ln2": {"g": jnp.ones((D,), d), "b": jnp.zeros((D,), d)},
            "fc1": {"w": _trunc_normal(next(keys), (D, H), 0.02, d), "b": jnp.zeros((H,), d)},
            "fc2": {"w": _trunc_normal(next(keys), (H, D), 0.02, d), "b": jnp.zeros((D,), d)},
        })
    params["layers"] = layers
    return params


def layernorm(x, p, eps=1e-6):
    mu = jnp.mean(x, -1, keepdims=True)
    var = jnp.var(x, -1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["g"] + p["b"]


def patchify(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """NHWC -> [B, N, p*p*C] patch rows (space-to-depth + flatten)."""
    B, H, W, C = x.shape
    gh, gw = H // patch, W // patch
    x = x.reshape(B, gh, patch, gw, patch, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # B gh gw p p C
    return x.reshape(B, gh * gw, patch * patch * C)


def attention(q, k, v, heads: int, impl: str = "xla"):
    if impl == "fused":
        from dlq_tpu.ops.pallas_attention import attention_fused
        return attention_fused(q, k, v, heads)
    if impl == "xla_int8":
        # dynamically-quantized int8 QKᵀ / scores·V at the XLA level — the
        # Mosaic-independent int8-attention path (ops/int8_attention)
        from dlq_tpu.ops.int8_attention import attention_int8_dynamic
        return attention_int8_dynamic(q, k, v, heads)
    B, N, D = q.shape
    hd = D // heads

    def split(t):
        return t.reshape(B, N, heads, hd).transpose(0, 2, 1, 3)  # B h N hd

    q, k, v = split(q), split(k), split(v)
    scores = jnp.einsum("bhnd,bhmd->bhnm", q, k, preferred_element_type=jnp.float32)
    scores = scores * (1.0 / jnp.sqrt(hd).astype(scores.dtype))
    attn = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhnm,bhmd->bhnd", attn, v, preferred_element_type=jnp.float32).astype(v.dtype)
    return out.transpose(0, 2, 1, 3).reshape(B, N, D)


def _encoder(y, get_ln, op, final_norm, depth: int, heads: int,
             attn_impl: str, fused_ln: bool, taps: bool,
             gelu: str = "exact"):
    """Shared pre-LN encoder loop for the fp32 and quantized paths.

    With fused_ln, each `y += delta; h = LN(y)` junction runs as ONE fused
    Pallas pass (the MLP residual of layer i fuses into layer i+1's LN1, and
    the final one into the output norm) — identical math, taps at the same
    block boundaries.
    """
    from dlq_tpu.ops.pallas_layernorm import layernorm_fused, residual_layernorm

    t: Dict[str, jnp.ndarray] = {}
    delta = None
    for i in range(depth):
        ln1, ln2 = get_ln(i)
        if delta is None:
            h = (layernorm_fused(y, ln1["g"], ln1["b"]) if fused_ln
                 else layernorm(y, ln1))
        elif fused_ln:
            y, h = residual_layernorm(y, delta, ln1["g"], ln1["b"])
            if taps:
                t[f"block{i-1}"] = y
        else:
            y = y + delta
            if taps:
                t[f"block{i-1}"] = y
            h = layernorm(y, ln1)
        qkv = op(i, "qkv", h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        a = attention(q, k, v, heads, impl=attn_impl)
        a = op(i, "proj", a)
        if fused_ln:
            y, h2 = residual_layernorm(y, a, ln2["g"], ln2["b"])
        else:
            y = y + a
            h2 = layernorm(y, ln2)
        m = op(i, "fc1", h2)
        m = jax.nn.gelu(m, approximate=(gelu == "tanh"))
        delta = op(i, "fc2", m)
    if fused_ln:
        y, hf = residual_layernorm(y, delta, final_norm["g"], final_norm["b"])
    else:
        y = y + delta
        hf = layernorm(y, final_norm)
    if taps:
        t[f"block{depth-1}"] = y
    return hf, t


def vit_forward(params: Params, x: jnp.ndarray, cfg: ViTConfig, taps: bool = False):
    B = x.shape[0]
    y = dense(patchify(x, cfg.patch), params["patch"]["w"], params["patch"]["b"])
    cls = jnp.broadcast_to(params["cls"].astype(y.dtype), (B, 1, cfg.dim))
    y = jnp.concatenate([cls, y], axis=1) + params["pos"].astype(y.dtype)
    t0 = {"embed": y} if taps else {}
    layers = params["layers"]
    hf, t = _encoder(
        y, lambda i: (layers[i]["ln1"], layers[i]["ln2"]),
        lambda i, name, xx: dense(xx, layers[i][name]["w"], layers[i][name]["b"]),
        params["norm"], cfg.depth, cfg.heads, cfg.attn_impl, cfg.fused_ln, taps,
        gelu=cfg.gelu,
    )
    logits = dense(hf[:, 0], params["head"]["w"], params["head"]["b"])
    if taps:
        t0.update(t)
        t0["logits"] = logits
        return logits, t0
    return logits


# ---------------------------------------------------------------------------
# quantized path
# ---------------------------------------------------------------------------

def flatten_vit(params: Params) -> Params:
    """Dense sites for the quantizer; LN/pos/cls stay fp32 'extras'."""
    flat: Params = {"patch": dict(params["patch"])}
    for i, lp in enumerate(params["layers"]):
        for name in ("qkv", "proj", "fc1", "fc2"):
            flat[f"l{i}.{name}"] = {"w": lp[name]["w"], "b": lp[name]["b"]}
    flat["head"] = dict(params["head"])
    return flat


def vit_extras(params: Params) -> Params:
    return {
        "cls": params["cls"],
        "pos": params["pos"],
        "norm": params["norm"],
        "ln": [{"ln1": lp["ln1"], "ln2": lp["ln2"]} for lp in params["layers"]],
    }


def make_qforward(extras: Params, depth: int, heads: int, patch: int, dim: int,
                  interchange=jnp.bfloat16, attn_impl: str = "xla",
                  fused_ln: bool = False, gelu: str = "exact"):
    """ctx-based quantized forward. `interchange` is the inter-op dtype:
    DeiT-Ti at dim 192 is elementwise-bound (LN/gelu/softmax/residuals), so
    bf16 interchange halves the traffic that dominates its runtime; the
    quantized matmuls are unaffected (they requantize their inputs).
    attn_impl/fused_ln select the Pallas deploy kernels (see ViTConfig)."""

    ex_ln = extras["ln"]

    def qforward(ctx, x, cfg, taps: bool = False):
        B = x.shape[0]
        x = x.astype(interchange)
        y = ctx.dense("patch", patchify(x, patch))
        cls = jnp.broadcast_to(extras["cls"].astype(y.dtype), (B, 1, dim))
        y = jnp.concatenate([cls, y], axis=1) + extras["pos"].astype(y.dtype)
        hf, t = _encoder(
            y, lambda i: (_cast_ln(ex_ln[i]["ln1"], y.dtype), _cast_ln(ex_ln[i]["ln2"], y.dtype)),
            lambda i, name, xx: ctx.dense(f"l{i}.{name}", xx),
            _cast_ln(extras["norm"], y.dtype), depth, heads, attn_impl, fused_ln, taps,
            gelu=gelu,
        )
        logits = ctx.dense("head", hf[:, 0]).astype(jnp.float32)
        if taps:
            t["logits"] = logits
            return logits, t
        return logits

    return qforward


def _cast_ln(p: Params, dtype) -> Params:
    return {"g": p["g"].astype(dtype), "b": p["b"].astype(dtype)}


@register("deit_tiny")
def _build_deit_tiny(**kw):
    cfg = ViTConfig(**kw)
    return cfg, init_vit, vit_forward

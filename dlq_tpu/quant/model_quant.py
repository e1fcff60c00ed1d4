"""Whole-model PTQ: flatten folded params, quantize weights, and run the
same topology in three modes through a QuantCtx:

  ObserveCtx   — fp32 compute, records each quantized op's input stats
                 (feeds `calibrate`)
  DeployCtx    — real integer compute (int8 MXU path / int4 fused kernels)
  SimulateCtx  — fp32 simulated-quant oracle: fake-quantized activations x
                 dequantized weights, for bitwise-checkable fixtures
                 (the reference's golden-fixture methodology, SURVEY §4,
                 applied to the quantized path)

Models define ONE `qforward(ctx, x, cfg)` against this API, so all three
modes share one topology definition — no per-step binaries (the reference's
structure) and no drift between oracle and deployment.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp

from dlq_tpu.models.common import conv2d, dense, relu
from dlq_tpu.ops.qops import qconv2d, qdense
from dlq_tpu.quant.qconfig import QConfig
from dlq_tpu.quant.quantize import QTensor, dequantize, quantize_act, quantize_tensor

FlatParams = Dict[str, Dict[str, Any]]  # site -> {"w": f32 | "qw": QTensor, "b": f32}


def quantize_weights(flat: FlatParams, qcfg: QConfig) -> FlatParams:
    """fp32 flat params -> quantized flat params (weights only; biases fp32).

    Conv weights (HWIO) quantize per-OC on axis -1; int4 group-wise weights
    are quantized on the 2D [H*W*I, O] view (group along the contraction).
    """
    from dlq_tpu.quant.quantize import effective_weight_scheme

    out: FlatParams = {}
    for site, p in flat.items():
        w = p["w"]
        # the odd-K / non-divisible-group int8 fallbacks live in ONE place
        # (effective_weight_scheme), shared with QAT's fake-quant
        scheme = effective_weight_scheme(w.shape, qcfg.scheme_for(site))
        if scheme.group is not None or scheme.bits == 4:
            # group-wise and nibble-packed tensors quantize on the 2D [K, O]
            # view (packing/groups run along the contraction axis); the
            # QTensor keeps that view, orig_shape restores the layout
            K = 1
            for d in w.shape[:-1]:
                K *= d
            qw = quantize_tensor(w.reshape(K, w.shape[-1]), scheme)
        else:
            qw = quantize_tensor(w, scheme)
        qw.orig_shape = tuple(w.shape)
        out[site] = {"qw": qw, "b": p.get("b")}
    return out


def _deq_weight(p: Dict[str, Any]) -> jnp.ndarray:
    """Dequantize a site's weight back to fp32 in its original layout."""
    qw: QTensor = p["qw"]
    w = dequantize(qw)
    return w.reshape(qw.layout_shape)


def _int_weight(qw: QTensor) -> jnp.ndarray:
    """Integer weight values in the original layout (int4 unpacked in-graph,
    exact — same accumulation either way)."""
    from dlq_tpu.quant.quantize import unpack_to_layout

    return unpack_to_layout(qw)


class ObserveCtx:
    """fp32 forward over folded params; records op inputs at `self.sites`."""

    def __init__(self, flat: FlatParams):
        self.flat = flat
        self.sites: Dict[str, jnp.ndarray] = {}

    def has(self, name):
        return name in self.flat

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        self.sites[name] = x
        p = self.flat[name]
        y = conv2d(x, p["w"], stride=stride, padding=padding, groups=groups, bias=p.get("b"))
        return relu(y) if fuse_relu else y

    def dense(self, name, x, *, fuse_relu=False):
        self.sites[name] = x
        p = self.flat[name]
        y = dense(x, p["w"], p.get("b"))
        return relu(y) if fuse_relu else y


class DeployCtx:
    """Real quantized compute: W8A8 int8 MXU path, or weight-only dequant.

    tp_wire: optional (mesh, wire_mode) set by Engine(tensor_parallel=True,
    wire=...) — routes the 2D classifier-head dense through the K-sharded
    compressed-wire collective (parallel/qcollectives.tp_qdense_head).
    """

    def __init__(self, qflat: FlatParams, act_scales: Optional[Dict[str, jnp.ndarray]], qcfg: QConfig,
                 tp_wire=None, dp_conv: bool = False,
                 depthwise: Optional[str] = None,
                 wire_sites: Optional[tuple] = None,
                 rewrites: tuple = ("mm1x1",)):
        from dlq_tpu.ops.qops import resolve_depthwise

        self.qflat = qflat
        self.act_scales = act_scales or {}
        self.qcfg = qcfg
        self.tp_wire = tp_wire
        # sites allowed onto the compressed-wire K-sharded dense; None ->
        # classifier head only (parallel/shard.TP_HEAD_SITES). The engine
        # passes the SAME tuple to kshard_head_sites so layout and routing
        # agree (wire_scope="mlp" adds the ViT fc2 row-parallel boundaries).
        self.wire_sites = wire_sites
        # dual-pixel packed Pallas conv for the C=OC=64 3x3/s1 shape class
        # (ResNet layer1) — pixel pairs in lanes fill the MXU where XLA's
        # conv runs at 50% (ops/pallas_conv.int8_conv3x3_s1_dp)
        self.dp_conv = dp_conv
        # depthwise impl pinned at ctx construction (NOT read from env at
        # trace time — the jit cache would freeze the first-seen value)
        self.depthwise = resolve_depthwise(depthwise)
        # exact XLA-level conv rewrites for sub-roofline shape classes
        # (stage_roofline r3): "dpx" width-pair 3x3/s1 C=OC=64, "s2d"
        # space-to-depth 3x3/s2, "down_mm" 1x1/s2 slice+matmul. All three
        # measured SLOWER than the direct conv (round-3 verdicts; opt-in
        # for compiler-drop re-measures). "mm1x1" (1x1/s1 conv as int8 dot
        # on the free [N*H*W, C] view) is ON BY DEFAULT: bit-exact and
        # +6% model-level on bottleneck resnets (runlogs/r6/mm1x1.jsonl —
        # r50 17.1k -> 18.2k img/s, r152 7.7k -> 8.2k b128); a no-op for
        # topologies without 1x1/s1/p0 sites (resnet18/34 headline path
        # unchanged). Pass rewrites=() to A/B the pre-round-6 behavior.
        self.rewrites = tuple(rewrites)

    def _tp_dense(self, name, x, p, fuse_relu):
        from dlq_tpu.parallel.qcollectives import tp_qdense_head

        mesh, wire = self.tp_wire
        qw = p["qw"]
        y = tp_qdense_head(
            x, qw.values, qw.scale, p.get("b"), self.act_scales[name],
            mesh, wire=wire, act_qmax=self.qcfg.acts.qmax)
        return relu(y) if fuse_relu else y

    def _tp_dense_ok(self, name, x, p):
        if self.tp_wire is None or self.qcfg.weight_only:
            return False
        from dlq_tpu.parallel.shard import TP_HEAD_SITES

        allowed = self.wire_sites if self.wire_sites is not None else TP_HEAD_SITES
        if name not in allowed:
            # only explicitly opted-in sites take the lossy compressed wire
            # — the same tuple kshard_head_sites lays out, so a body dense
            # can never hit the K-sharded path un-sharded (or silently
            # accumulate per-layer wire rounding, ADVICE r2)
            return False
        qw = p["qw"]
        mesh = self.tp_wire[0]
        return (x.ndim >= 2 and qw.bits == 8 and qw.group is None
                and qw.values.ndim == 2
                and qw.values.shape[0] % mesh.shape["model"] == 0)

    def _tp_pin(self, t, *, sharded: bool):
        """TP body wire control (round 4): pin a fused-conv tensor's layout
        so the channel all-gather GSPMD inserts before the next conv rides
        the INT8 epilogue output, not the f32 accumulator. Without the pin,
        sharding propagation gathers f32 — measured on the virtual mesh:
        ALL boundary collectives were f32 even on the int8-interchange path
        (runlogs/r4/comm_model.jsonl) — 4x the ICI/DCN bytes. Values are
        unchanged (a with_sharding_constraint is layout-only); `sharded=True`
        keeps the per-OC epilogue sharded, `sharded=False` marks the gather
        point on the int8 tensor."""
        if self.tp_wire is None:
            return t
        from jax.sharding import NamedSharding, PartitionSpec as P

        mesh = self.tp_wire[0]
        n = mesh.shape["model"]
        if t.ndim < 2 or t.shape[-1] % n or t.shape[-1] < n:
            return t
        spec = P("data", *([None] * (t.ndim - 2)),
                 "model" if sharded else None)
        return _jax.lax.with_sharding_constraint(
            t, NamedSharding(mesh, spec))

    def has(self, name):
        return name in self.qflat

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.qflat[name]
        if self.qcfg.weight_only:
            w = _deq_weight(p).astype(x.dtype)
            y = conv2d(x, w, stride=stride, padding=padding, groups=groups, bias=p.get("b"))
            return relu(y) if fuse_relu else y
        return qconv2d(x, p["qw"], p.get("b"), self.act_scales[name],
                       stride=stride, padding=padding, groups=groups,
                       fuse_relu=fuse_relu, act_qmax=self.qcfg.acts.qmax,
                       depthwise=self.depthwise, rewrites=self.rewrites)

    def dense(self, name, x, *, fuse_relu=False):
        p = self.qflat[name]
        if self._tp_dense_ok(name, x, p):
            return self._tp_dense(name, x, p, fuse_relu)
        scale = None if self.qcfg.weight_only else self.act_scales[name]
        qmax = 127 if self.qcfg.acts is None else self.qcfg.acts.qmax
        return qdense(x, p["qw"], p.get("b"), act_scale=scale,
                      fuse_relu=fuse_relu, act_qmax=qmax)


class DynamicDeployCtx(DeployCtx):
    """Calibration-free W8A8: per-batch activation scales computed at
    RUNTIME (one amax reduction per site, fused by XLA into the surrounding
    graph) instead of static calibrated scales. Deploys a quantized model
    with no calibration data at a small per-site reduction cost; on a batch
    equal to a minmax calibration batch it is bit-identical to DeployCtx.
    fp32 interchange only (dynamic scales can't pre-commit an int8 wire
    format between ops)."""

    def __init__(self, qflat: FlatParams, qcfg: QConfig,
                 depthwise: Optional[str] = None):
        super().__init__(qflat, {}, qcfg, depthwise=depthwise)

    def _scale(self, x):
        amax = jnp.max(jnp.abs(x.astype(jnp.float32)))
        return jnp.maximum(amax / self.qcfg.acts.qmax, 1e-12)

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.qflat[name]
        return qconv2d(x, p["qw"], p.get("b"), self._scale(x), stride=stride,
                       padding=padding, groups=groups, fuse_relu=fuse_relu,
                       act_qmax=self.qcfg.acts.qmax, depthwise=self.depthwise,
                       rewrites=self.rewrites)

    def dense(self, name, x, *, fuse_relu=False):
        p = self.qflat[name]
        return qdense(x, p["qw"], p.get("b"), act_scale=self._scale(x),
                      fuse_relu=fuse_relu, act_qmax=self.qcfg.acts.qmax)


class SimulateCtx:
    """fp32 oracle with identical quantization decisions (fake-quant)."""

    def __init__(self, qflat: FlatParams, act_scales: Optional[Dict[str, jnp.ndarray]], qcfg: QConfig):
        self.qflat = qflat
        self.act_scales = act_scales or {}
        self.qcfg = qcfg

    def has(self, name):
        return name in self.qflat

    def _fake_act(self, name, x):
        if self.qcfg.weight_only:
            return x.astype(jnp.float32)
        s = self.act_scales[name]
        q = quantize_act(x, s, self.qcfg.acts.qmax)
        return q.astype(jnp.float32) * s

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.qflat[name]
        xf = self._fake_act(name, x)
        w = _deq_weight(p)
        y = conv2d(xf, w, stride=stride, padding=padding, groups=groups, bias=p.get("b"))
        return relu(y) if fuse_relu else y

    def dense(self, name, x, *, fuse_relu=False):
        p = self.qflat[name]
        xf = self._fake_act(name, x)
        qw: QTensor = p["qw"]
        w = dequantize(qw).reshape(qw.layout_shape)
        y = dense(xf, w, p.get("b"))
        return relu(y) if fuse_relu else y


class QAct:
    """A quantized activation traveling between ops: int8 values + scale.

    Registered as a pytree so it flows through jit/engines unchanged.
    """

    def __init__(self, q: jnp.ndarray, scale: jnp.ndarray):
        self.q = q
        self.scale = scale

    @property
    def shape(self):
        return self.q.shape


import jax as _jax  # noqa: E402

_jax.tree_util.register_pytree_node(
    QAct, lambda a: ((a.q, a.scale), None), lambda _, xs: QAct(*xs)
)


class FusedDeployCtx(DeployCtx):
    """W8A8 with INT8 INTERCHANGE: conv outputs are requantized to the
    consumer's calibrated scale inside the epilogue (round/clip fused with
    the rescale; relu folds into the clip's lower bound), so activations
    cross HBM as int8 — 4x less traffic than the fp32-interchange DeployCtx.

    Numerically identical to DeployCtx: the consumer would have applied
    quantize_act with the same scale to the same values; we just apply it
    earlier and keep the int8 form.

    Usage: the model's fused qforward passes ``out_site`` (the consumer's
    calibration site) to emit a QAct, or omits it to get fp32 (e.g. before
    residual adds / GAP); ``ctx.quant(site, y)`` requantizes an fp32 tensor.
    """

    def quant(self, site: str, y: jnp.ndarray) -> QAct:
        s = self.act_scales[site]
        return QAct(quantize_act(y, s, self.qcfg.acts.qmax), s)

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False,
             fuse_relu6=False, out_site: Optional[str] = None):
        from dlq_tpu.ops.qops import _conv_int8

        p = self.qflat[name]
        if isinstance(x, QAct):
            xq, s_in = x.q, x.scale
        else:
            s_in = self.act_scales[name]
            xq = quantize_act(x, s_in, self.qcfg.acts.qmax)
        if (self.dp_conv and stride in (1, (1, 1)) and padding in (1, (1, 1))
                and groups == 1 and not fuse_relu6
                and self.qcfg.acts.qmax == 127 and p["qw"].bits == 8):
            w_hwio = _int_weight(p["qw"])
            if (w_hwio.shape[:2] == (3, 3) and w_hwio.shape[2] == 64
                    and w_hwio.shape[3] == 64 and xq.shape[2] % 2 == 0):
                if self.dp_conv == "xla":
                    # width-pair packed XLA conv: free reshapes + one int8
                    # 3x2 conv at 128x128 channels (full lane fill, bit-
                    # exact; qops.pack_w_dual_xla). The Pallas dual-pixel
                    # kernel expressing the same packing was measured-
                    # rejected (32 TOPS, runlogs/r3) — this lets XLA's own
                    # conv do it.
                    from dlq_tpu.ops.qops import conv_int8_dpx, pack_w_dual_xla

                    acc = conv_int8_dpx(xq, pack_w_dual_xla(w_hwio))
                    y = acc.astype(jnp.float32) * (s_in * p["qw"].scale)
                    if p.get("b") is not None:
                        y = y + p["b"]
                    if out_site is None:
                        return jnp.maximum(y, 0.0) if fuse_relu else y
                    s_out = self.act_scales[out_site]
                    qmax = self.qcfg.acts.qmax
                    lo = 0.0 if fuse_relu else -float(qmax)
                    q = jnp.clip(jnp.round(y / s_out), lo, qmax).astype(jnp.int8)
                    return QAct(q, s_out)
                from dlq_tpu.ops.pallas_conv import (
                    int8_conv3x3_s1_dp, pack_w_dual,
                )

                w6 = pack_w_dual(w_hwio)
                combined = s_in * p["qw"].scale
                if out_site is None:
                    return int8_conv3x3_s1_dp(
                        xq, w6, combined, p.get("b"), fuse_relu=fuse_relu)
                s_out = self.act_scales[out_site]
                q = int8_conv3x3_s1_dp(
                    xq, w6, combined, p.get("b"), out_scale=s_out,
                    fuse_relu=fuse_relu, out_int8=True)
                return QAct(q, s_out)
        stride_t = (stride, stride) if isinstance(stride, int) else stride
        pad_t = (padding, padding) if isinstance(padding, int) else padding
        wq8 = p["qw"]
        acc = None
        # bits 4 qualifies too: _int_weight unpacks nibble-packed int4 to
        # int8 in layout, so every rewrite's integer math is unchanged
        # (W4A8 convs then take mm1x1 like their W8A8 twins)
        if self.rewrites and groups == 1 and wq8.bits in (4, 8):
            w_hwio = _int_weight(wq8)
            kh, kw = w_hwio.shape[:2]
            # dpx/s2d/down_mm keep their original even-H/W guard (their
            # measured verdicts were taken under it); mm1x1 has no spatial
            # relayout so it applies at any H/W (stage4's 7x7 included)
            even_hw = xq.shape[1] % 2 == 0 and xq.shape[2] % 2 == 0
            if ("dpx" in self.rewrites and even_hw and (kh, kw) == (3, 3)
                    and stride_t == (1, 1) and pad_t == (1, 1)
                    and w_hwio.shape[2] == 64 and w_hwio.shape[3] == 64):
                from dlq_tpu.ops.qops import conv_int8_dpx, pack_w_dual_xla

                acc = conv_int8_dpx(xq, pack_w_dual_xla(w_hwio))
            elif ("s2d" in self.rewrites and even_hw and (kh, kw) == (3, 3)
                    and stride_t == (2, 2) and pad_t == (1, 1)):
                from dlq_tpu.ops.qops import conv_int8_s2d, pack_w_s2d

                acc = conv_int8_s2d(xq, pack_w_s2d(w_hwio))
            elif ("down_mm" in self.rewrites and even_hw
                    and (kh, kw) == (1, 1)
                    and stride_t == (2, 2) and pad_t == (0, 0)):
                from dlq_tpu.ops.qops import conv_int8_down_mm

                acc = conv_int8_down_mm(
                    xq, w_hwio.reshape(w_hwio.shape[2], w_hwio.shape[3]))
            elif ("mm1x1" in self.rewrites and (kh, kw) == (1, 1)
                    and stride_t == (1, 1) and pad_t == (0, 0)):
                from dlq_tpu.ops.qops import conv_int8_mm1x1

                acc = conv_int8_mm1x1(
                    xq, w_hwio.reshape(w_hwio.shape[2], w_hwio.shape[3]))
        if acc is None:
            acc = _conv_int8(xq, _int_weight(p["qw"]), stride, padding, groups,
                             depthwise=self.depthwise)
        if groups == 1:
            # keep the f32 accumulator + per-OC epilogue OC-sharded under
            # TP; the boundary gather then lands on the int8 output below
            acc = self._tp_pin(acc, sharded=True)
        combined = s_in * p["qw"].scale  # () or (OC,)
        y = acc.astype(jnp.float32) * combined
        if p.get("b") is not None:
            y = y + p["b"]
        if fuse_relu6:
            y = jnp.clip(y, 0.0, 6.0)
        if out_site is None:
            return jnp.maximum(y, 0.0) if fuse_relu else y
        s_out = self.act_scales[out_site]
        qmax = self.qcfg.acts.qmax
        lo = 0.0 if (fuse_relu or fuse_relu6) else -float(qmax)
        q = jnp.clip(jnp.round(y / s_out), lo, qmax).astype(jnp.int8)
        if groups == 1:
            q = self._tp_pin(q, sharded=False)  # int8-wire gather point
        return QAct(q, s_out)

    def add(self, a: QAct, b: QAct) -> QAct:
        """a + b in the int domain (no relu); both at the same scale."""
        qmax = self.qcfg.acts.qmax
        acc = a.q.astype(jnp.int32) + b.q.astype(jnp.int32)
        q = jnp.clip(acc, -qmax, qmax).astype(jnp.int8)
        return QAct(q, a.scale)

    def dense(self, name, x, *, fuse_relu=False):
        if isinstance(x, QAct):
            p = self.qflat[name]
            if self._tp_dense_ok(name, x.q, p):
                # wire-compressed TP head: dequantize and re-enter the
                # shard_map K-sharded path (one extra rounding on the head)
                return self._tp_dense(
                    name, x.q.astype(jnp.float32) * x.scale, p, fuse_relu)
            # direct int8 matmul on the already-quantized activation
            acc = _jax.lax.dot(x.q, _int_weight(p["qw"]),
                               preferred_element_type=jnp.int32)
            y = acc.astype(jnp.float32) * (x.scale * p["qw"].scale)
            if p.get("b") is not None:
                y = y + p["b"]
            return jnp.maximum(y, 0.0) if fuse_relu else y
        return super().dense(x=x, name=name, fuse_relu=fuse_relu)


class PallasDeployCtx(DeployCtx):
    """W8A8 deploy routed through the custom Pallas kernels where eligible:

      3x3 stride-1 groups-1 conv -> implicit-GEMM `int8_conv3x3_s1`
      1x1 stride-1 conv          -> `int8_matmul` on the [N*H*W, C] view
      dense                      -> `int8_matmul` (89% roofline vs XLA 85%)

    Anything else (strided, 7x7 stem, depthwise) falls back to XLA's int8
    conv. Numerics identical to DeployCtx (same int32 accum + fp32 epilogue).

    STATUS: kernels are bit-exact on TPU, but XLA's own int8 convs measure
    93-95% of roofline on ResNet body shapes, so this ctx is currently
    SLOWER than DeployCtx at model level (BENCH_NOTES.md) — it exists for
    kernel development and for shapes where XLA's conv underperforms.
    Production paths: FullFusedCtx (ResNet), DeployCtx (others).
    """

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.qflat[name]
        if self.qcfg.weight_only:
            return super().conv(name, x, stride=stride, padding=padding,
                                groups=groups, fuse_relu=fuse_relu)
        qw: QTensor = p["qw"]
        if qw.bits != 8:
            return super().conv(name, x, stride=stride, padding=padding,
                                groups=groups, fuse_relu=fuse_relu)
        kh, kw = qw.layout_shape[0], qw.layout_shape[1]
        s_in = self.act_scales[name]
        stride_t = (stride, stride) if isinstance(stride, int) else stride
        if groups == 1 and (kh, kw) == (3, 3) and stride_t == (1, 1) and padding in (1, (1, 1)):
            from dlq_tpu.ops.pallas_conv import int8_conv3x3_s1

            xq = quantize_act(x, s_in, self.qcfg.acts.qmax)
            w = qw.values.reshape(qw.layout_shape)
            y = int8_conv3x3_s1(xq, w, s_in * qw.scale, p.get("b"), fuse_relu=fuse_relu)
            return y.astype(x.dtype)
        if groups == 1 and (kh, kw) == (1, 1) and stride_t == (1, 1) and padding in (0, (0, 0)):
            from dlq_tpu.ops.pallas_matmul import int8_matmul_padded

            xq = quantize_act(x, s_in, self.qcfg.acts.qmax)
            N, H, W, C = xq.shape
            w2 = qw.values.reshape(C, qw.layout_shape[-1])
            y = int8_matmul_padded(
                xq.reshape(N * H * W, C), w2, s_in * qw.scale, p.get("b"),
                fuse_relu=fuse_relu,
            )
            return y.reshape(N, H, W, -1).astype(x.dtype)
        return super().conv(name, x, stride=stride, padding=padding,
                            groups=groups, fuse_relu=fuse_relu)

    def dense(self, name, x, *, fuse_relu=False):
        p = self.qflat[name]
        if self._tp_dense_ok(name, x, p):
            return self._tp_dense(name, x, p, fuse_relu)
        if self.qcfg.weight_only:
            return super().dense(name, x, fuse_relu=fuse_relu)
        from dlq_tpu.ops.pallas_matmul import int8_matmul_padded

        qw: QTensor = p["qw"]
        K, N_ = qw.shape[-2], qw.shape[-1]
        if qw.bits != 8 or K % 128 != 0 or N_ % 128 != 0:
            return super().dense(name, x, fuse_relu=fuse_relu)
        s_in = self.act_scales[name]
        lead = x.shape[:-1]
        x2 = x.reshape(-1, x.shape[-1])
        xq = quantize_act(x2, s_in, self.qcfg.acts.qmax)
        y = int8_matmul_padded(xq, qw.values, s_in * qw.scale, p.get("b"),
                               fuse_relu=fuse_relu)
        return y.reshape(lead + (N_,)).astype(x.dtype)


class FullFusedCtx(FusedDeployCtx):
    """Fully-int8 interchange: EVERY inter-op tensor is int8, including the
    stem->maxpool chain and the residual junctions.

    Residual adds happen in the int8 domain at the consumer's scale: both
    addends requantize to s_out (one extra rounding each vs DeployCtx — the
    classic TFLite add semantics), sum in int32, relu+clip back to int8.
    This cuts the model's inter-op HBM traffic 4x vs fp32 interchange at the
    cost of a small, measured accuracy delta.
    """

    def requant(self, x: QAct, site: str) -> QAct:
        """int8 -> int8 rescale to another site's scale."""
        s_out = self.act_scales[site]
        qmax = self.qcfg.acts.qmax
        q = jnp.clip(jnp.round(x.q.astype(jnp.float32) * (x.scale / s_out)),
                     -qmax, qmax).astype(jnp.int8)
        return QAct(q, s_out)

    def add_relu(self, a: QAct, b: QAct) -> QAct:
        """relu(a + b) in the int domain; both addends must share a scale."""
        qmax = self.qcfg.acts.qmax
        acc = a.q.astype(jnp.int32) + b.q.astype(jnp.int32)
        q = jnp.clip(acc, 0, qmax).astype(jnp.int8)
        return QAct(q, a.scale)  # same-scale contract (a.scale == b.scale)

    def maxpool(self, x: QAct, window=3, stride=2, padding=1) -> QAct:
        from dlq_tpu.models.common import maxpool2d

        return QAct(maxpool2d(x.q, window, stride, padding), x.scale)

    def conv_stem_bf16(self, name: str, x: jnp.ndarray, *, out_site: str,
                       stride=2, padding=3) -> QAct:
        """Mixed-precision stem: compute the C=3 input conv in bf16 (the
        int8 conv path packs tiny input-channel counts onto the MXU at ~16%
        utilization; the bf16 conv path runs it ~3x faster despite half the
        nominal rate), then requantize to int8 in the epilogue. Weights are
        the dequantized int8 values, so the only deviation from the int32
        path is bf16 accumulation noise — far below the int8 output
        quantization step."""
        p = self.qflat[name]
        qw: QTensor = p["qw"]
        w = _deq_weight(p).astype(jnp.bfloat16)
        y = conv2d(x.astype(jnp.bfloat16), w, stride=stride, padding=padding,
                   preferred=jnp.float32)
        y = y.astype(jnp.float32)
        if p.get("b") is not None:
            y = y + p["b"]
        qmax = self.qcfg.acts.qmax
        s_out = self.act_scales[out_site]
        q = jnp.clip(jnp.round(y / s_out), 0.0, qmax).astype(jnp.int8)  # relu folded
        return QAct(q, s_out)

    def conv_stem_bf16_u8(self, name: str, u8: jnp.ndarray, *, out_site: str,
                          mean=None, std=None, stride=2, padding=3) -> QAct:
        """uint8 image ingest with the preprocess fold: the deploy engine
        takes raw uint8 NHWC (4x less input bandwidth, no separate
        normalize pass — the reference ran preprocessing as its own NumPy
        stage, `tools/preprocess_to_bin.py:8-44`). Exact rewrite of
        normalize+conv:  x_norm = (u - 255*mean) / (255*std), so the
        per-input-channel 1/(255*std_c) folds into the dequantized bf16
        stem weights and the -255*mean shift is a fused subtract; zero
        padding of (u - 255*mean) corresponds exactly to x_norm = 0."""
        import numpy as _np

        from dlq_tpu.data.preprocess import IMAGENET_MEAN, IMAGENET_STD

        mean = IMAGENET_MEAN if mean is None else mean
        std = IMAGENET_STD if std is None else std
        p = self.qflat[name]
        w = _deq_weight(p).astype(jnp.float32)
        inv = (1.0 / (255.0 * _np.asarray(std, _np.float32)))
        w = (w * jnp.asarray(inv)[None, None, :, None]).astype(jnp.bfloat16)
        m255 = jnp.asarray(255.0 * _np.asarray(mean, _np.float32), jnp.bfloat16)
        xb = u8.astype(jnp.bfloat16) - m255
        y = conv2d(xb, w, stride=stride, padding=padding,
                   preferred=jnp.float32).astype(jnp.float32)
        if p.get("b") is not None:
            y = y + p["b"]
        qmax = self.qcfg.acts.qmax
        s_out = self.act_scales[out_site]
        q = jnp.clip(jnp.round(y / s_out), 0.0, qmax).astype(jnp.int8)  # relu folded
        return QAct(q, s_out)

    def conv_stem_s2d(self, name: str, x: jnp.ndarray, *, out_site: str) -> QAct:
        """The 7x7/s2/p3 stem as an EXACT space-to-depth rewrite: quantize
        the input, s2d(2) it (int8, so the relayout moves 4x fewer bytes
        than fp32), and run a 4x4 stride-1 VALID conv whose kernel is the
        zero-padded 8x8 rearrangement of the quantized 7x7 weights. Same
        int32 accumulation as ctx.conv on the original stem — identical
        results, better MXU utilization (K: 147 -> 192, aligned taps)."""
        import jax as _j

        p = self.qflat[name]
        qw: QTensor = p["qw"]
        s_in = self.act_scales[name]
        qmax = self.qcfg.acts.qmax
        N, H, W, Cin = x.shape
        assert H % 2 == 0 and W % 2 == 0, (H, W)
        xq = quantize_act(x, s_in, qmax)
        # pad 4 before / 2 after: out[i,j] = sum_u xp[2i+u, ...] w8[u], u<8
        xp4 = jnp.pad(xq, ((0, 0), (4, 2), (4, 2), (0, 0)))
        h2, w2 = (H + 6) // 2, (W + 6) // 2
        s2 = xp4.reshape(N, h2, 2, w2, 2, Cin).transpose(0, 1, 3, 2, 4, 5)
        s2 = s2.reshape(N, h2, w2, 4 * Cin)
        w7 = _int_weight(qw)  # [7,7,Cin,OC] int8
        w8 = jnp.pad(w7, ((1, 0), (1, 0), (0, 0), (0, 0)))
        OC = w7.shape[-1]
        w4 = w8.reshape(4, 2, 4, 2, Cin, OC).transpose(0, 2, 1, 3, 4, 5)
        w4 = w4.reshape(4, 4, 4 * Cin, OC)
        acc = _j.lax.conv_general_dilated(
            s2, w4, (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s_in * qw.scale)
        if p.get("b") is not None:
            y = y + p["b"]
        s_out = self.act_scales[out_site]
        q = jnp.clip(jnp.round(y / s_out), 0.0, qmax).astype(jnp.int8)  # relu folded
        return QAct(q, s_out)

    def gap_dense(self, name: str, x: QAct) -> jnp.ndarray:
        """int32 global-average pool + quantized fc on the pooled vector."""
        acc = jnp.sum(x.q.astype(jnp.int32), axis=(1, 2))
        hw = x.q.shape[1] * x.q.shape[2]
        g = acc.astype(jnp.float32) * (x.scale / hw)
        return self.dense(name, g)


class PallasBlockCtx(FullFusedCtx):
    """FullFusedCtx + fused Pallas kernels for identity residual blocks.

    Blocks present in ``block_packs`` (built offline by
    ops/pallas_block.pack_fused_blocks) run as single Pallas kernels —
    conv chain, requants, int8 residual add and relu in one VMEM pass —
    instead of the XLA op composition; everything else (strided/downsample
    blocks, stem, head) falls through to FullFusedCtx. Numerics match up to
    fp32 reassociation of the folded epilogue scales (see pallas_block.py).
    """

    def __init__(self, qflat, act_scales, qcfg, block_packs=None,
                 kernel_opts=None):
        super().__init__(qflat, act_scales, qcfg)
        self.block_packs = block_packs or {}
        self.kernel_opts = kernel_opts or {}

    def fused_block(self, site: str, x: QAct, nxt: Optional[str]):
        """Run `site`'s whole residual block fused if packed; else None."""
        pack = self.block_packs.get(site)
        if pack is None or nxt is None:
            return None
        from dlq_tpu.ops.pallas_block import (
            basic_block_fused, bottleneck_block_fused,
        )
        fn = bottleneck_block_fused if "w3" in pack else basic_block_fused
        return QAct(fn(x.q, pack, **self.kernel_opts), self.act_scales[nxt])


def make_sites_fn(qforward: Callable, cfg) -> Callable:
    """(flat_params, x) -> {site: input activation}, for `calibrate`."""

    def sites_fn(flat: FlatParams, x):
        ctx = ObserveCtx(flat)
        qforward(ctx, x, cfg)
        return ctx.sites

    return sites_fn

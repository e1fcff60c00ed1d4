"""Quantize/dequantize primitives and the QTensor container.

TPU-first choices: int8 values feed the MXU directly (int8xint8->int32 at 2x
bf16 throughput on v5e); int4 weights are stored nibble-packed in uint8 and
unpacked in-register inside the Pallas matmul (`dlq_tpu/ops/pallas_matmul.py`).
Scales are always fp32. Symmetric schemes have no zero point; affine
activation quantization carries an int32 zero point.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.quant.qconfig import QScheme


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class QTensor:
    """A quantized tensor: integer values + scale (+ optional zero point).

    values: int8 array, or uint8 nibble-packed when bits == 4 (packed along
            the FIRST axis — the contraction axis of a [K, O] weight).
    scale:  fp32, shape broadcastable per scheme:
              per-tensor: ()    per-channel: (O,)    group-wise: (K//g, O)
    shape:  logical (unpacked) shape.
    """

    values: jnp.ndarray
    scale: jnp.ndarray
    zero_point: Optional[jnp.ndarray]
    bits: int
    axis: Optional[int]
    group: Optional[int]
    shape: Tuple[int, ...]
    # original layout shape (e.g. HWIO) when `shape` is a flattened [K, O]
    # view; static aux data so it survives jit tracing as python ints
    orig_shape: Optional[Tuple[int, ...]] = None

    def tree_flatten(self):
        leaves = (self.values, self.scale, self.zero_point)
        aux = (self.bits, self.axis, self.group, self.shape, self.orig_shape)
        return leaves, aux

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        values, scale, zp = leaves
        return cls(values, scale, zp, *aux)

    @property
    def layout_shape(self) -> Tuple[int, ...]:
        return self.orig_shape if self.orig_shape is not None else self.shape

    @property
    def nbytes(self) -> int:
        return sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in (self.values, self.scale) if a is not None)


def _amax_per(arr: jnp.ndarray, axis: Optional[int]) -> jnp.ndarray:
    """abs-max reduced over all dims except `axis` (None = all dims)."""
    a = jnp.abs(arr)
    if axis is None:
        return jnp.max(a)
    axis = axis % arr.ndim
    red = tuple(i for i in range(arr.ndim) if i != axis)
    return jnp.max(a, axis=red)


def quantize_tensor(arr: jnp.ndarray, scheme: QScheme, amax: Optional[jnp.ndarray] = None) -> QTensor:
    """Symmetric (or affine per-tensor) quantization of a weight/activation.

    For group-wise int4 the array must be 2D [K, O] (reshape conv HWIO to
    [H*W*I, O] first); groups run along K.
    """
    arr = jnp.asarray(arr, jnp.float32)
    if scheme.group is not None:
        if arr.ndim != 2:
            raise ValueError("group-wise quantization expects a 2D [K, O] view")
        K, O = arr.shape
        g = scheme.group
        if K % g != 0:
            raise ValueError(f"K={K} not divisible by group={g}")
        grouped = arr.reshape(K // g, g, O)
        amax_g = jnp.max(jnp.abs(grouped), axis=1)  # [K//g, O]
        scale = jnp.maximum(amax_g / scheme.qmax, 1e-12)
        q = jnp.clip(jnp.round(grouped / scale[:, None, :]), scheme.qmin, scheme.qmax)
        q = q.reshape(K, O).astype(jnp.int8)
        values = pack_int4(q) if scheme.bits == 4 else q
        return QTensor(values, scale, None, scheme.bits, scheme.axis, g, tuple(arr.shape))

    if not scheme.symmetric:
        if scheme.axis is not None:
            raise NotImplementedError("affine quantization is per-tensor only")
        lo, hi = jnp.min(arr), jnp.max(arr)
        lo = jnp.minimum(lo, 0.0)
        hi = jnp.maximum(hi, 0.0)
        scale = jnp.maximum((hi - lo) / (scheme.qmax - scheme.qmin), 1e-12)
        zp = jnp.round(scheme.qmin - lo / scale).astype(jnp.int32)
        q = jnp.clip(jnp.round(arr / scale) + zp, scheme.qmin, scheme.qmax).astype(jnp.int8)
        return QTensor(q, scale, zp, scheme.bits, None, None, tuple(arr.shape))

    a = _amax_per(arr, scheme.axis) if amax is None else amax
    scale = jnp.maximum(a / scheme.qmax, 1e-12)
    if scheme.axis is not None:
        bshape = [1] * arr.ndim
        bshape[scheme.axis % arr.ndim] = -1
        s = scale.reshape(bshape)
    else:
        s = scale
    q = jnp.clip(jnp.round(arr / s), scheme.qmin, scheme.qmax).astype(jnp.int8)
    values = pack_int4(q) if scheme.bits == 4 else q
    return QTensor(values, scale, None, scheme.bits, scheme.axis, None, tuple(arr.shape))


def dequantize(qt: QTensor) -> jnp.ndarray:
    """fp32 reconstruction — the bit-exact oracle for the fused kernels."""
    q = unpack_int4(qt.values, qt.shape) if qt.bits == 4 else qt.values
    q = q.astype(jnp.float32)
    if qt.zero_point is not None:
        q = q - qt.zero_point
    if qt.group is not None:
        K, O = qt.shape
        g = qt.group
        return (q.reshape(K // g, g, O) * qt.scale[:, None, :]).reshape(K, O)
    if qt.axis is not None:
        bshape = [1] * len(qt.shape)
        bshape[qt.axis % len(qt.shape)] = -1
        return q * qt.scale.reshape(bshape)
    return q * qt.scale


def effective_weight_scheme(shape: Tuple[int, ...], scheme) -> "QScheme":  # noqa: F821
    """The scheme a weight of `shape` ACTUALLY quantizes under — the single
    definition of the odd-K / non-divisible-group int8 fallbacks, shared by
    quantize_weights (PTQ) and QATCtx (training) so fake-quant semantics
    always match deployment. [K, O] view: K = prod(shape[:-1])."""
    import dataclasses as _dc

    K = 1
    for d in shape[:-1]:
        K *= d
    if scheme.group is not None:
        if K % scheme.group != 0 or (scheme.bits == 4 and K % 2 != 0):
            return _dc.replace(scheme, group=None, bits=8)
        return scheme
    if scheme.bits == 4 and K % 2 != 0:
        return _dc.replace(scheme, bits=8)  # nibble packing needs even K
    return scheme


def unpack_to_layout(qt: QTensor) -> jnp.ndarray:
    """Integer weight values in the tensor's original layout: int8 (and
    int2-stored-as-int8) as-is; per-OC int4 unpacked from nibbles (exact)."""
    if qt.bits == 4:
        return unpack_int4(qt.values, qt.shape).reshape(qt.layout_shape)
    return qt.values.reshape(qt.layout_shape)


def quantize_act(x: jnp.ndarray, scale: jnp.ndarray, qmax: int = 127) -> jnp.ndarray:
    """Static symmetric activation quantization: fp -> int8 with given scale.
    Elementwise; XLA fuses it into the surrounding graph."""
    return jnp.clip(jnp.round(x.astype(jnp.float32) / scale), -qmax, qmax).astype(jnp.int8)


# ---------------------------------------------------------------------------
# int4 nibble packing. Packed along axis 0 (the contraction axis of [K, O]):
# byte b at [k, o] holds values[2k] in the low nibble, values[2k+1] high.
# ---------------------------------------------------------------------------

def pack_int4(q: jnp.ndarray) -> jnp.ndarray:
    """int8 array with values in [-8, 7] -> uint8 packed, axis-0 halved."""
    if q.shape[0] % 2 != 0:
        raise ValueError(f"axis 0 ({q.shape[0]}) must be even to pack")
    lo = q[0::2].astype(jnp.uint8) & 0xF
    hi = (q[1::2].astype(jnp.uint8) & 0xF) << 4
    return lo | hi


def unpack_int4(packed: jnp.ndarray, shape: Tuple[int, ...]) -> jnp.ndarray:
    """uint8 packed -> int8 [-8, 7] with logical `shape` (axis-0 doubled)."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    # sign-extend nibbles: v >= 8 -> v - 16
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    out = jnp.stack([lo, hi], axis=1).reshape((-1,) + tuple(packed.shape[1:]))
    return out[: shape[0]].reshape(shape)


# Halves packing: byte k holds values[k] (low nibble) and values[k + K/2]
# (high). Unlike the adjacent-row packing above, the in-kernel split
# contraction then needs only CONTIGUOUS lane slices of the activation
# (x[:, :K/2] and x[:, K/2:]) — the pair-row interleave Mosaic cannot
# relayout never appears. Used by the W4 fused ViT block kernel.

def pack_int4_halves(q: jnp.ndarray) -> jnp.ndarray:
    """int8 [-8,7] array [K, ...] -> uint8 [K/2, ...], top/bottom halves."""
    if q.shape[0] % 2 != 0:
        raise ValueError(f"axis 0 ({q.shape[0]}) must be even to pack")
    h = q.shape[0] // 2
    lo = q[:h].astype(jnp.uint8) & 0xF
    hi = (q[h:].astype(jnp.uint8) & 0xF) << 4
    return lo | hi


def unpack_int4_halves(packed: jnp.ndarray) -> jnp.ndarray:
    """Inverse of pack_int4_halves: [K/2, ...] uint8 -> [K, ...] int8."""
    lo = (packed & 0xF).astype(jnp.int8)
    hi = ((packed >> 4) & 0xF).astype(jnp.int8)
    lo = jnp.where(lo >= 8, lo - 16, lo)
    hi = jnp.where(hi >= 8, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=0)

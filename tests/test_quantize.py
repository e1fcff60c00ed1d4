"""Quantize/dequantize primitive tests: round-trip error bounds, int4
packing exactness, per-channel vs per-tensor, group-wise scales."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dlq_tpu.quant import QScheme, dequantize, pack_int4, quantize_tensor, unpack_int4
from dlq_tpu.quant.quantize import quantize_act


def test_int8_per_tensor_roundtrip(rng):
    x = rng.normal(size=(64, 32)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(x), QScheme(8, True, None))
    xr = np.asarray(dequantize(qt))
    # error bounded by scale/2 per element
    s = float(qt.scale)
    assert np.max(np.abs(xr - x)) <= s * 0.5 + 1e-7
    assert qt.values.dtype == jnp.int8


def test_int8_per_channel_better_than_per_tensor(rng):
    # one channel much larger than others -> per-channel wins
    x = rng.normal(size=(128, 8)).astype(np.float32)
    x[:, 0] *= 100
    xj = jnp.asarray(x)
    e_pt = np.abs(np.asarray(dequantize(quantize_tensor(xj, QScheme(8, True, None)))) - x).mean()
    e_pc = np.abs(np.asarray(dequantize(quantize_tensor(xj, QScheme(8, True, -1)))) - x).mean()
    assert e_pc < e_pt / 5


def test_per_channel_scale_shape(rng):
    x = rng.normal(size=(3, 3, 16, 32)).astype(np.float32)
    qt = quantize_tensor(jnp.asarray(x), QScheme(8, True, -1))
    assert qt.scale.shape == (32,)
    xr = np.asarray(dequantize(qt))
    smax = np.asarray(qt.scale).max()
    assert np.max(np.abs(xr - x)) <= smax * 0.5 + 1e-7


def test_int4_pack_unpack_exact(rng):
    q = rng.integers(-8, 8, size=(64, 24)).astype(np.int8)
    packed = pack_int4(jnp.asarray(q))
    assert packed.shape == (32, 24) and packed.dtype == jnp.uint8
    back = np.asarray(unpack_int4(packed, (64, 24)))
    np.testing.assert_array_equal(back, q)


def test_int4_groupwise(rng):
    K, O, g = 256, 16, 128
    x = rng.normal(size=(K, O)).astype(np.float32)
    x[:128] *= 50  # first group hot -> group-wise scales must adapt
    qt = quantize_tensor(jnp.asarray(x), QScheme(4, True, -1, group=g))
    assert qt.scale.shape == (K // g, O)
    assert qt.values.shape == (K // 2, O)  # packed along K
    xr = np.asarray(dequantize(qt))
    # per-group bound: |err| <= scale/2 elementwise
    s = np.asarray(qt.scale)
    bound = np.repeat(s, g, axis=0) * 0.5 + 1e-6
    assert np.all(np.abs(xr - x) <= bound)


def test_affine_per_tensor(rng):
    x = (rng.random(size=(32, 32)).astype(np.float32) * 5 + 3)  # strictly positive
    qt = quantize_tensor(jnp.asarray(x), QScheme(8, False, None))
    assert qt.zero_point is not None
    xr = np.asarray(dequantize(qt))
    assert np.max(np.abs(xr - x)) <= float(qt.scale) * 0.5 + 1e-6


def test_quantize_act_static_scale():
    x = jnp.array([[0.0, 1.0, -1.0, 200.0]])
    q = quantize_act(x, jnp.float32(1.0))
    np.testing.assert_array_equal(np.asarray(q), [[0, 1, -1, 127]])  # clips


def test_quantize_jit_compatible(rng):
    x = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))
    qfn = jax.jit(lambda a: quantize_tensor(a, QScheme(8, True, -1)))
    qt = qfn(x)
    xr = dequantize(qt)
    assert np.max(np.abs(np.asarray(xr) - np.asarray(x))) < 0.1

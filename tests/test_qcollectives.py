"""Quantized collectives: exactness (fp32), near-losslessness (bf16), and
bounded error (int8 two-phase) on a virtual 8-device mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from dlq_tpu.parallel.mesh import MeshConfig, make_mesh
from dlq_tpu.parallel.qcollectives import qpsum_int8, tp_matmul_ksharded


@pytest.fixture(scope="module")
def mesh8():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices (conftest sets host device count)")
    return make_mesh(MeshConfig(data=1, model=8))


def _cosine(a, b):
    a, b = np.asarray(a, np.float64).ravel(), np.asarray(b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))


def test_qpsum_int8_matches_sum(mesh8):
    from jax import shard_map

    n = 8
    rng = np.random.default_rng(0)
    # per-device addends with heterogeneous magnitudes (the hard case for a
    # shared wire scale — each device gets its own)
    parts = rng.normal(0, 1, (n, 64, 128)).astype(np.float32)
    parts *= rng.uniform(0.1, 10.0, (n, 1, 1)).astype(np.float32)
    exact = parts.sum(0)

    f = shard_map(
        lambda x: qpsum_int8(x[0], "model")[None],
        mesh=mesh8, in_specs=P("model"), out_specs=P("model"), check_vma=False,
    )
    out = np.asarray(f(jnp.asarray(parts)))
    for d in range(n):
        np.testing.assert_allclose(out[d], out[0], rtol=0, atol=0)
    assert _cosine(out[0], exact) > 0.9999
    rel = np.abs(out[0] - exact).max() / np.abs(exact).max()
    assert rel < 0.02, rel


@pytest.mark.parametrize("wire,tol", [("fp32", 1e-6), ("bf16", 0.02), ("int8", 0.02)])
def test_tp_matmul_ksharded(mesh8, wire, tol):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(0, 1, (32, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (256, 128)), jnp.float32)
    exact = np.asarray(jnp.dot(x, w))
    out = np.asarray(tp_matmul_ksharded(x, w, mesh8, wire=wire))
    assert _cosine(out, exact) > 0.999
    rel = np.abs(out - exact).max() / np.abs(exact).max()
    assert rel < tol, (wire, rel)


@pytest.mark.parametrize("wire,tol", [("fp32", 1e-5), ("bf16", 3e-2), ("int8", 3e-2)])
def test_tp_qdense_head(wire, tol):
    """The production wire-compressed TP classifier head vs the unsharded
    W8A8 qdense with identical quantization decisions."""
    from dlq_tpu.ops.qops import qdense
    from dlq_tpu.parallel.qcollectives import tp_qdense_head
    from dlq_tpu.quant.qconfig import QScheme
    from dlq_tpu.quant.quantize import quantize_tensor

    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(data=4, model=2))
    rng = np.random.default_rng(3)
    B, K, N = 16, 256, 48
    x = jnp.asarray(rng.normal(0, 1, (B, K)), jnp.float32)
    w = jnp.asarray(rng.normal(0, 0.05, (K, N)), jnp.float32)
    b = jnp.asarray(rng.normal(0, 0.1, (N,)), jnp.float32)
    qw = quantize_tensor(w, QScheme(8, True, -1))
    act_scale = jnp.float32(np.abs(np.asarray(x)).max() / 127.0)

    ref = np.asarray(qdense(x, qw, b, act_scale=act_scale))
    out = np.asarray(tp_qdense_head(x, qw.values, qw.scale, b, act_scale,
                                    mesh, wire=wire))
    d_cos = _cosine(out, ref)
    assert d_cos > 1 - tol, (wire, d_cos)
    if wire == "fp32":
        np.testing.assert_allclose(out, ref, atol=1e-4)

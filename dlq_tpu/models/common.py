"""Shared layer primitives for the model zoo.

TPU-first conventions (deliberately NOT the reference's):
  * activations are NHWC (XLA TPU's preferred conv layout), weights HWIO —
    the reference is NCHW/OIHW throughout (`kernels/im2col.cu:6-57`);
    import converts.
  * convolution lowers to `lax.conv_general_dilated`, which XLA tiles onto
    the MXU directly — there is no materialized im2col (the reference's
    measured 65 ms im2col vs 0.5 ms GEMM cliff, `reports/Step2.md:106-118`,
    is a non-problem by construction).
  * inference BatchNorm is an affine fold: either kept separate (for
    stage-parity fixtures vs the torch oracle) or folded into the preceding
    conv's weights at import time (the deployment path).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

Params = Dict[str, jnp.ndarray]

BN_EPS = 1e-5  # matches torch BatchNorm2d default and kernels/bn_inference.cu


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------

def he_uniform(key, shape: Tuple[int, ...], fan_in: int, dtype=jnp.float32):
    """He/Kaiming uniform: U(-sqrt(6/fan_in), +sqrt(6/fan_in)).

    Matches the reference's cross-implementation init contract
    (`CUDA/MNIST_on_GPU/v1.py:54-65`, same formula in v2-v5) so loss curves
    are comparable across the ladder.
    """
    bound = float(np.sqrt(6.0 / fan_in))
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def kaiming_normal(key, shape: Tuple[int, ...], fan_out: int, dtype=jnp.float32):
    """fan_out-mode kaiming normal — torch's Conv2d default in resnet."""
    std = float(np.sqrt(2.0 / fan_out))
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# layer primitives (pure functions over param dicts)
# ---------------------------------------------------------------------------

def conv2d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int | Tuple[int, int] = 1,
    padding: int | Tuple[int, int] = 0,
    groups: int = 1,
    bias: Optional[jnp.ndarray] = None,
    preferred: jnp.dtype | None = None,
) -> jnp.ndarray:
    """NHWC x HWIO conv. `padding` is symmetric int(s) like torch."""
    if isinstance(stride, int):
        stride = (stride, stride)
    if isinstance(padding, int):
        padding = (padding, padding)
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=stride,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        preferred_element_type=preferred,
    )
    if bias is not None:
        y = y + bias
    return y


def dense(x: jnp.ndarray, w: jnp.ndarray, b: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """x[..., I] @ w[I, O] + b. Weight layout is IO (TPU-native), not torch OI."""
    y = jnp.dot(x, w, preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b
    return y


def batchnorm_inference(x: jnp.ndarray, bn: Params, eps: float = BN_EPS) -> jnp.ndarray:
    """y = gamma * (x - mean) / sqrt(var + eps) + beta, per channel (last axis).

    Semantics of `kernels/bn_inference.cu:6-28`, vectorized over NHWC.
    """
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    scale = (bn["gamma"] * inv).astype(x.dtype)
    shift = (bn["beta"] - bn["mean"] * bn["gamma"] * inv).astype(x.dtype)
    return x * scale + shift


def batchnorm_train(x: jnp.ndarray, bn: Params, eps: float = BN_EPS):
    """Training-mode BN: normalize with BATCH statistics (biased variance,
    torch semantics). Returns (y, (batch_mean, batch_var)) so the train step
    can EMA-update the running mean/var carried in `bn` — which do NOT enter
    this forward (their grads are structurally zero).

    The round-2 trained-accuracy study collapsed to 7% top-1 because the
    resnet trained through `batchnorm_inference` with init stats (mean 0,
    var 1): an 18-layer net with no effective normalization. This is the
    fix — train with batch stats, deploy with the learned running stats
    (folded by fold_bn exactly as before).
    """
    xf = x.astype(jnp.float32)
    axes = tuple(range(x.ndim - 1))  # all but the channel (last) axis
    mean = jnp.mean(xf, axis=axes)
    var = jnp.mean(jnp.square(xf - mean), axis=axes)
    inv = jax.lax.rsqrt(var + eps)
    y = (xf - mean) * (bn["gamma"].astype(jnp.float32) * inv) + bn["beta"]
    return y.astype(x.dtype), (mean, var)


def update_bn_stats(bn: Params, stats, momentum: float = 0.1, n: int | None = None) -> Params:
    """EMA-update running mean/var from one batch's stats (torch momentum
    convention: running = (1-m)*running + m*batch; var uses the unbiased
    estimate when the reduce count `n` is given)."""
    mean, var = stats
    if n is not None and n > 1:
        var = var * (n / (n - 1))
    return {
        "gamma": bn["gamma"],
        "beta": bn["beta"],
        "mean": (1 - momentum) * bn["mean"] + momentum * mean,
        "var": (1 - momentum) * bn["var"] + momentum * var,
    }


def fold_bn(w: jnp.ndarray, bias: Optional[jnp.ndarray], bn: Params, eps: float = BN_EPS):
    """Fold inference BN into the preceding conv/dense weight.

    Returns (w', b') with  w'[..., o] = w[..., o] * g[o]/sqrt(v[o]+eps)
    and b' = beta + (bias - mean) * g/sqrt(v+eps). Output-channel axis is the
    last axis for both HWIO conv weights and IO dense weights.
    """
    inv = jax.lax.rsqrt(bn["var"].astype(jnp.float32) + eps)
    scale = bn["gamma"].astype(jnp.float32) * inv
    w2 = (w.astype(jnp.float32) * scale).astype(w.dtype)
    b0 = bias.astype(jnp.float32) if bias is not None else 0.0
    b2 = (bn["beta"].astype(jnp.float32) + (b0 - bn["mean"].astype(jnp.float32)) * scale).astype(w.dtype)
    return w2, b2


def maxpool2d(x: jnp.ndarray, window: int = 3, stride: int = 2, padding: int = 1) -> jnp.ndarray:
    """NHWC maxpool; semantics of kernels/maxpool2d.cu (3x3/s2/p1) generalized."""
    if jnp.issubdtype(x.dtype, jnp.floating):
        init = jnp.array(-jnp.inf, x.dtype)
    else:
        init = jnp.array(jnp.iinfo(x.dtype).min, x.dtype)
    return jax.lax.reduce_window(
        x,
        init,
        jax.lax.max,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )


def avgpool2d(x: jnp.ndarray, window: int, stride: int, padding: int = 0) -> jnp.ndarray:
    # init must be a python scalar, not a traced array — reduce_window's
    # autodiff linearization fails on array init values
    init = 0.0 if jnp.issubdtype(x.dtype, jnp.floating) else 0
    s = jax.lax.reduce_window(
        x,
        init,
        jax.lax.add,
        (1, window, window, 1),
        (1, stride, stride, 1),
        [(0, 0), (padding, padding), (padding, padding), (0, 0)],
    )
    return s / (window * window)


def global_avgpool(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC -> NC global average pool (kernels/gap_global.cu semantics,
    including the fixed-reduction variant gap_global_ref, infer_e2e.cu:37-61)."""
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2)).astype(x.dtype)


def relu(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(x, 0)


def softmax(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable softmax (kernels/softmax.cu:6-47 semantics)."""
    return jax.nn.softmax(x, axis=axis)


def init_bn(c: int, dtype=jnp.float32) -> Params:
    return {
        "gamma": jnp.ones((c,), dtype),
        "beta": jnp.zeros((c,), dtype),
        "mean": jnp.zeros((c,), dtype),
        "var": jnp.ones((c,), dtype),
    }

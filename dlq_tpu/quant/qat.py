"""Quantization-aware training (QAT): straight-through-estimator fake-quant
fine-tuning.

The reference's roadmap explicitly calls for INT8/INT2 *training* experiments
(`reports/Step2.md:164-168`); PTQ alone cannot hold accuracy at 2-4 bits.
This module realizes that capability TPU-natively: the whole train step —
fake-quant, forward, loss, backward, SGD update, EMA scale update — is ONE
jitted function (loss never leaves the device, the v5-rung design from the
MNIST ladder), and the fake-quant semantics are exactly the deploy semantics
(same round-half-even, same clip bounds, same per-channel axes), so a
QAT-trained model drops into `quantize_weights` + DeployCtx unchanged.

Design:
  * `QATCtx` mirrors the qforward ctx API (`has`/`conv`/`dense`), so the SAME
    single topology definition used by observe/deploy/simulate trains under
    fake quantization — no QAT-specific model code.
  * Weights fake-quantize from their live fp32 values each step (scales are
    recomputed, stop-gradient); gradients pass straight through inside the
    clip range and are zeroed outside it (clipped-STE).
  * Activation scales are functional EMA state threaded through the step
    (initialized by the standard `calibrate` pass), updated from batch amax
    outside the gradient.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from dlq_tpu.models.common import conv2d, dense, relu
from dlq_tpu.quant.qconfig import QConfig, QScheme

FlatParams = Dict[str, Dict[str, Any]]


def fake_quant_ste(x: jnp.ndarray, scale: jnp.ndarray, qmax: int) -> jnp.ndarray:
    """Symmetric fake-quant with clipped straight-through gradients.

    Forward: scale * clip(round(x/scale), -qmax, qmax) — identical values to
    quantize_act + dequantize. Backward: identity where |x| <= qmax*scale,
    zero where the clip saturates (the PACT/DoReFa convention; an unclipped
    STE lets saturated weights drift forever).
    """
    scale = jax.lax.stop_gradient(scale)
    q = jnp.clip(jnp.round(x / scale), -qmax, qmax) * scale
    inside = jnp.abs(x) <= qmax * scale
    return jnp.where(inside, x + jax.lax.stop_gradient(q - x),
                     jax.lax.stop_gradient(q))


def _weight_fq(w: jnp.ndarray, scheme: QScheme) -> jnp.ndarray:
    """Fake-quant a weight under the scheme it will ACTUALLY deploy with:
    effective_weight_scheme applies the same odd-K / non-divisible-group
    int8 fallbacks as quantize_weights, so QAT never trains a site at a
    precision deployment won't use."""
    from dlq_tpu.quant.quantize import effective_weight_scheme

    scheme = effective_weight_scheme(w.shape, scheme)
    a = jnp.abs(w)
    if scheme.group is not None:
        K = int(np.prod(w.shape[:-1]))
        O = w.shape[-1]
        g = scheme.group
        amax = jnp.max(a.reshape(K // g, g, O), axis=1, keepdims=True)
        s = jnp.broadcast_to(amax, (K // g, g, O)).reshape(w.shape)
        scale = jnp.maximum(s / scheme.qmax, 1e-12)
    elif scheme.axis is not None:
        axis = scheme.axis % w.ndim
        red = tuple(i for i in range(w.ndim) if i != axis)
        amax = jnp.max(a, axis=red, keepdims=True)
        scale = jnp.maximum(amax / scheme.qmax, 1e-12)
    else:
        scale = jnp.maximum(jnp.max(a) / scheme.qmax, 1e-12)
    return fake_quant_ste(w, scale, scheme.qmax)


class QATCtx:
    """Fake-quant training context over fp32 flat params.

    Mirrors ObserveCtx/DeployCtx's surface so any `qforward(ctx, x, cfg)`
    trains under quantization unchanged. Records each quantized site's batch
    activation amax (stop-gradient) in `self.batch_amax` for the EMA update.
    """

    def __init__(self, flat: FlatParams, act_scales: Dict[str, jnp.ndarray],
                 qcfg: QConfig):
        self.flat = flat
        self.act_scales = act_scales
        self.qcfg = qcfg
        self.batch_amax: Dict[str, jnp.ndarray] = {}

    def has(self, name):
        return name in self.flat

    def _fq_act(self, name, x):
        if self.qcfg.weight_only:
            return x
        self.batch_amax[name] = jax.lax.stop_gradient(jnp.max(jnp.abs(x)))
        return fake_quant_ste(x, self.act_scales[name], self.qcfg.acts.qmax)

    def _fq_weight(self, name, w):
        return _weight_fq(w, self.qcfg.scheme_for(name))  # per-site scheme

    def conv(self, name, x, *, stride=1, padding=0, groups=1, fuse_relu=False):
        p = self.flat[name]
        y = conv2d(self._fq_act(name, x), self._fq_weight(name, p["w"]),
                   stride=stride, padding=padding, groups=groups,
                   bias=p.get("b"))
        return relu(y) if fuse_relu else y

    def dense(self, name, x, *, fuse_relu=False):
        p = self.flat[name]
        y = dense(self._fq_act(name, x), self._fq_weight(name, p["w"]),
                  p.get("b"))
        return relu(y) if fuse_relu else y


def _softmax_ce(logits, labels):
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, logits.shape[-1], dtype=logp.dtype)
    return -jnp.mean(jnp.sum(logp * onehot, axis=-1))


def make_qat_step(qforward: Callable, cfg, qcfg: QConfig, lr: float = 0.01,
                  momentum: float = 0.9, ema: float = 0.99):
    """One fused jitted QAT step: fake-quant forward, CE loss, clipped-STE
    backward, SGD+momentum update, EMA activation-scale update."""
    qmax = None if qcfg.weight_only else qcfg.acts.qmax

    @jax.jit
    def step(flat, vel, scales, x, y):
        def loss_fn(p):
            ctx = QATCtx(p, scales, qcfg)
            logits = qforward(ctx, x, cfg)
            return _softmax_ce(logits, y), (logits, ctx.batch_amax)

        (loss, (logits, amax)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(flat)
        vel = jax.tree_util.tree_map(
            lambda v, g: momentum * v - lr * g, vel, grads)
        flat = jax.tree_util.tree_map(lambda p, v: p + v, flat, vel)
        if qmax is not None:
            scales = {
                site: ema * scales[site] + (1.0 - ema) * (amax[site] / qmax)
                for site in scales
            }
        acc = jnp.mean(jnp.argmax(logits, -1) == y)
        return flat, vel, scales, loss, acc

    return step


def qat_train(
    qforward: Callable,
    flat: FlatParams,
    cfg,
    qcfg: QConfig,
    X: np.ndarray,
    Y: np.ndarray,
    epochs: int = 3,
    batch: int = 64,
    lr: float = 0.01,
    momentum: float = 0.9,
    ema: float = 0.99,
    act_scales: Optional[Dict[str, jnp.ndarray]] = None,
    seed: int = 0,
) -> Tuple[FlatParams, Dict[str, jnp.ndarray], Dict[str, Any]]:
    """QAT fine-tune; returns (flat, act_scales, history). The outputs feed
    `quantize_weights(flat, qcfg)` + DeployCtx directly (deployment parity is
    tested, not assumed)."""
    if act_scales is None and not qcfg.weight_only:
        from dlq_tpu.quant.calibrate import calibrate
        from dlq_tpu.quant.model_quant import make_sites_fn

        act_scales = calibrate(make_sites_fn(qforward, cfg), flat,
                               [jnp.asarray(X[:batch])], qcfg)
    act_scales = {k: jnp.asarray(v, jnp.float32)
                  for k, v in (act_scales or {}).items()}
    step = make_qat_step(qforward, cfg, qcfg, lr, momentum, ema)
    vel = jax.tree_util.tree_map(jnp.zeros_like, flat)
    n = (len(X) // batch) * batch
    if n == 0:
        raise ValueError(f"dataset ({len(X)} rows) smaller than one batch ({batch})")
    rng = np.random.default_rng(seed)
    history = []
    for ep in range(epochs):
        order = rng.permutation(n)
        losses, accs = [], []
        for i in range(0, n, batch):
            idx = order[i : i + batch]
            flat, vel, act_scales, loss, acc = step(
                flat, vel, act_scales, jnp.asarray(X[idx]), jnp.asarray(Y[idx]))
            losses.append(loss)
            accs.append(acc)
        history.append({"epoch": ep,
                        "loss": float(jnp.mean(jnp.stack(losses))),
                        "acc": float(jnp.mean(jnp.stack(accs)))})
    return flat, act_scales, {"epochs": history}

"""Quantized-model persistence: qflat params + act scales <-> Manifest.

The reference's checkpoint analogue is its manifest + .bin weight store
(SURVEY §5.4); here the quantized weight store IS the deployment artifact:
int8/packed-int4 values, fp32 scales, biases, and per-site activation
scales, all as manifest tensors with ``quant`` blocks, so a deployed engine
cold-starts without torch, calibration data, or the fp32 weights.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from dlq_tpu.manifest import Manifest, QuantMeta
from dlq_tpu.quant.qconfig import QConfig, QScheme
from dlq_tpu.quant.quantize import QTensor

FlatParams = Dict[str, Dict[str, Any]]


def save_quantized(
    root: str,
    model: str,
    qflat: FlatParams,
    act_scales: Optional[Dict[str, jnp.ndarray]],
    qcfg: QConfig,
    extras: Optional[Dict[str, Any]] = None,
    meta: Optional[Dict[str, Any]] = None,
) -> str:
    """Write a deployable quantized model directory."""
    m = Manifest(root, model=model, meta={
        "qconfig": {
            "weights": dataclasses.asdict(qcfg.weights),
            "acts": dataclasses.asdict(qcfg.acts) if qcfg.acts else None,
            "weight_overrides": [
                [pat, dataclasses.asdict(s)] for pat, s in qcfg.weight_overrides
            ],
            "calibration": qcfg.calibration,
            "percentile": qcfg.percentile,
        },
        **(meta or {}),
    })
    for site, p in qflat.items():
        qw: QTensor = p["qw"]
        scale_name = f"{site}.w.scale"
        # int2 values are stored in int8 arrays but keep their bit-width in
        # the manifest dtype so the round-trip preserves QTensor.bits
        dtype = {4: "int4", 2: "int2"}.get(qw.bits, "int8")
        vals = np.asarray(qw.values)
        m.add(
            f"{site}.w", vals,
            dtype=dtype,
            logical_shape=qw.shape,
            layout="KO",
            kind="qweight",
            quant=QuantMeta(
                scheme="symmetric",
                axis=qw.axis,
                group=qw.group,
                scale=scale_name,
            ),
        )
        m.add(scale_name, np.asarray(qw.scale, np.float32), kind="scale")
        # record original layout shape so convs can reshape back
        m.meta.setdefault("w_shapes", {})[site] = list(p["qw"].layout_shape)
        if p.get("b") is not None:
            m.add(f"{site}.b", np.asarray(p["b"], np.float32), layout="O", kind="bias")
    for site, s in (act_scales or {}).items():
        m.add(f"{site}.act.scale", np.asarray(s, np.float32).reshape(-1), kind="act_scale")
    for name, arr in _flatten_extras(extras or {}):
        m.add(f"extra.{name}", np.asarray(arr, np.float32), kind="extra")
    return m.save()


def load_quantized(root: str) -> Tuple[FlatParams, Dict[str, jnp.ndarray], QConfig, Dict[str, Any]]:
    """Read back (qflat, act_scales, qcfg, extras) ready for DeployCtx."""
    m = Manifest.load(root)
    if "qconfig" not in m.meta:
        raise ValueError(
            f"{root}: manifest has no 'qconfig' meta block — this is a "
            "plain weight export, not a quantized store (quant.store."
            "save_quantized writes the qconfig; tools/quantize_model.py "
            "produces one)")
    qc = m.meta["qconfig"]
    qcfg = QConfig(
        weights=QScheme(**qc["weights"]),
        acts=QScheme(**qc["acts"]) if qc.get("acts") else None,
        calibration=qc.get("calibration", "minmax"),
        percentile=qc.get("percentile", 99.99),
        weight_overrides=tuple(
            (pat, QScheme(**d)) for pat, d in qc.get("weight_overrides", [])
        ),
    )
    w_shapes = m.meta.get("w_shapes", {})
    qflat: FlatParams = {}
    act_scales: Dict[str, jnp.ndarray] = {}
    extras: Dict[str, Any] = {}
    for tm in m:
        if tm.kind == "qweight":
            site = tm.name[: -len(".w")]
            scale = jnp.asarray(m.read(tm.quant.scale))
            bits = {"int4": 4, "int2": 2}.get(tm.dtype, 8)
            values = jnp.asarray(m.read(tm.name))
            qflat.setdefault(site, {})["qw"] = QTensor(
                values=values,
                scale=scale,
                zero_point=None,
                bits=bits,
                axis=tm.quant.axis,
                group=tm.quant.group,
                shape=tuple(tm.shape),
                orig_shape=tuple(w_shapes.get(site, tm.shape)),
            )
        elif tm.kind == "bias":
            site = tm.name[: -len(".b")]
            qflat.setdefault(site, {})["b"] = jnp.asarray(m.read(tm.name))
        elif tm.kind == "act_scale":
            site = tm.name[: -len(".act.scale")]
            arr = m.read(tm.name)
            act_scales[site] = jnp.asarray(arr[0] if arr.size == 1 else arr)
        elif tm.kind == "extra":
            extras[tm.name[len("extra."):]] = jnp.asarray(m.read(tm.name))
    for site, p in qflat.items():
        p.setdefault("b", None)
    return qflat, act_scales, qcfg, extras


def materialize_int8(qflat: FlatParams) -> FlatParams:
    """Unpack every per-OC int4 QTensor to int8 ONCE (exact — same integer
    values, same scales). Deploy-time choice: the artifact stays 4-bit on
    disk, but runtime weights are int8, trading 2x HBM residency for the
    full W8A8 rate (the in-graph per-forward unpack costs ~11% on ResNet,
    BENCH_NOTES "W4A8 conv models"). Group-wise int4 is left packed (its
    scales cannot fold into the int8 epilogue)."""
    from dlq_tpu.quant.quantize import unpack_int4

    out: FlatParams = {}
    for site, p in qflat.items():
        qw = p.get("qw")
        if qw is not None and qw.bits == 4 and qw.group is None:
            qw = QTensor(
                values=unpack_int4(qw.values, qw.shape).reshape(qw.layout_shape),
                scale=qw.scale, zero_point=None, bits=8, axis=qw.axis,
                group=None, shape=qw.layout_shape, orig_shape=qw.orig_shape,
            )
            out[site] = {**p, "qw": qw}
        else:
            out[site] = p
    return out


def unflatten_extras(flat: Dict[str, Any]) -> Dict[str, Any]:
    """Inverse of _flatten_extras: dotted names -> nested dicts, with
    all-numeric-key levels converted back to lists (e.g. per-layer LN
    stacks). Enables Engine.from_store to rebuild model extras."""
    root: Dict[str, Any] = {}
    for name, v in flat.items():
        parts = name.split(".")
        cur = root
        for p in parts[:-1]:
            cur = cur.setdefault(p, {})
        cur[parts[-1]] = v

    def fix(d):
        if isinstance(d, dict):
            if d and all(k.isdigit() for k in d):
                return [fix(d[str(i)]) for i in range(len(d))]
            return {k: fix(v) for k, v in d.items()}
        return d

    return fix(root)


def _flatten_extras(extras: Dict[str, Any], prefix: str = ""):
    for k, v in extras.items():
        name = f"{prefix}{k}"
        if isinstance(v, dict):
            yield from _flatten_extras(v, name + ".")
        elif isinstance(v, (list, tuple)):
            for i, item in enumerate(v):
                if isinstance(item, dict):
                    yield from _flatten_extras(item, f"{name}.{i}.")
                else:
                    yield f"{name}.{i}", item
        else:
            yield name, v

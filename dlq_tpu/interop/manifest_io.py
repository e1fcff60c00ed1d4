"""Param pytree <-> manifest conversion (the L1 weight-exchange layer)."""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from dlq_tpu.manifest import Manifest


def flatten_tree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    out: Dict[str, np.ndarray] = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}."))
    elif isinstance(tree, (list, tuple)):
        for i, v in enumerate(tree):
            out.update(flatten_tree(v, f"{prefix}{i}."))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_into(template: Any, flat: Dict[str, np.ndarray], prefix: str = "") -> Any:
    """Rebuild a pytree shaped like `template` from name->array, validating
    shapes (the size-validation contract of utils.hpp:52-58)."""
    if isinstance(template, dict):
        return {k: unflatten_into(v, flat, f"{prefix}{k}.") for k, v in template.items()}
    if isinstance(template, (list, tuple)):
        seq = [unflatten_into(v, flat, f"{prefix}{i}.") for i, v in enumerate(template)]
        return type(template)(seq) if isinstance(template, tuple) else seq
    name = prefix[:-1]
    if name not in flat:
        raise KeyError(f"manifest missing tensor {name}")
    arr = flat[name]
    tshape = tuple(getattr(template, "shape", arr.shape))
    if tuple(arr.shape) != tshape:
        raise ValueError(f"{name}: shape {arr.shape} != expected {tshape}")
    return jnp.asarray(arr)


def save_params(root: str, model: str, params: Any, meta: Dict[str, Any] | None = None) -> str:
    m = Manifest(root, model=model, meta=meta or {})
    for name, arr in sorted(flatten_tree(params).items()):
        layout = "HWIO" if arr.ndim == 4 else ("IO" if arr.ndim == 2 else "O")
        kind = ("conv_weight" if arr.ndim == 4
                else "dense_weight" if arr.ndim == 2 else "vector")
        m.add(name, arr, layout=layout, kind=kind)
    return m.save()


def load_params(root: str, template: Any) -> Any:
    """Load a manifest weight store into a pytree shaped like `template`
    (typically a freshly init'ed model's params)."""
    m = Manifest.load(root)
    flat = {tm.name: m.read(tm.name) for tm in m}
    return unflatten_into(template, flat)

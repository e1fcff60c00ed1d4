"""Training checkpoint / resume.

The reference never saved training state (MNIST retrains from scratch each
run — SURVEY §5.4); here training runs checkpoint through the same manifest
store as inference weights: params + step counter + config fingerprint, with
atomic directory swap so a killed run never leaves a torn checkpoint.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

from dlq_tpu.interop.manifest_io import load_params, save_params


def save_checkpoint(root: str, params: Any, step: int, meta: Optional[Dict[str, Any]] = None) -> str:
    """Atomically write <root>/ckpt (tmp dir + rename)."""
    tmp = root + ".tmp"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    save_params(tmp, "checkpoint", params, meta={"step": step, **(meta or {})})
    with open(os.path.join(tmp, "STATE.json"), "w") as f:
        json.dump({"step": step, "meta": meta or {}}, f)
    if os.path.exists(root):
        shutil.rmtree(root)
    os.replace(tmp, root)
    return root


def load_checkpoint(root: str, template: Any) -> Tuple[Any, int, Dict[str, Any]]:
    with open(os.path.join(root, "STATE.json")) as f:
        state = json.load(f)
    params = load_params(root, template)
    return params, int(state["step"]), state.get("meta", {})


def latest_step(root: str) -> Optional[int]:
    path = os.path.join(root, "STATE.json")
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return int(json.load(f)["step"])

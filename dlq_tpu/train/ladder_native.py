"""The ladder's native C++ rung ("v3"): drives native/mlp_train.

Exports the SAME initial weights the python rungs use plus the .bin data
contract, runs the compiled binary, and parses its loss/timing report —
the reference's v3.c capability with bit-comparable starting weights.
"""

from __future__ import annotations

import os
import re
import subprocess
from typing import Any, Dict, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_BIN = os.path.join(_NATIVE_DIR, "mlp_train")


def available() -> bool:
    if os.path.exists(_BIN):
        return True
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR, "mlp_train"], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_BIN)
    except Exception:
        return False


def train_native(X: np.ndarray, Y: np.ndarray, workdir: str, lr=0.01, batch=8,
                 epochs=10, seed=0) -> Tuple[Dict[str, np.ndarray], Dict[str, Any]]:
    """Run the C++ rung; returns (final weights, report)."""
    if not available():
        raise RuntimeError("native mlp_train unavailable (no toolchain?)")
    from dlq_tpu.train.ladder_numpy import init_params

    os.makedirs(workdir, exist_ok=True)
    p = init_params(seed, (X.shape[1], 256, 10))
    np.ascontiguousarray(X, np.float32).tofile(os.path.join(workdir, "X_train.bin"))
    np.ascontiguousarray(Y, np.int32).tofile(os.path.join(workdir, "y_train.bin"))
    p["W"][0].tofile(os.path.join(workdir, "w1.bin"))
    p["b"][0].tofile(os.path.join(workdir, "b1.bin"))
    p["W"][1].tofile(os.path.join(workdir, "w2.bin"))
    p["b"][1].tofile(os.path.join(workdir, "b2.bin"))

    out = subprocess.run(
        [_BIN, workdir, str(epochs), str(batch), str(lr)],
        capture_output=True, text=True, timeout=3600,
    )
    if out.returncode != 0:
        raise RuntimeError(f"mlp_train failed: {out.stderr[-500:]}")
    history = [{"epoch": int(m.group(1)), "loss": float(m.group(2))}
               for m in re.finditer(r"epoch (\d+) loss ([\d.eE+-]+)", out.stdout)]
    total = float(re.search(r"total_s ([\d.]+)", out.stdout).group(1))
    phases = dict(re.findall(r"(\w+):(\d+)%", out.stdout))
    weights = {
        "W": [np.fromfile(os.path.join(workdir, "w1_out.bin"), np.float32).reshape(X.shape[1], 256),
              np.fromfile(os.path.join(workdir, "w2_out.bin"), np.float32).reshape(256, 10)],
        "b": [np.fromfile(os.path.join(workdir, "b1_out.bin"), np.float32),
              np.fromfile(os.path.join(workdir, "b2_out.bin"), np.float32)],
    }
    report = {"total_s": total, "phases_pct": phases, "history": history,
              "final_loss": history[-1]["loss"] if history else float("nan")}
    return weights, report

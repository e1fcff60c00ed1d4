"""Feature-map inspection — capability parity with
`DeepLearning/CheckFeaturemap/resnet18_feat.py`.

The reference registers forward hooks on 12 named ResNet-18 modules, picks
the top-K channels by L2 energy per layer, min-max normalizes each channel,
and saves a PNG grid (`resnet18_feat.py:31-83,105-138`). Functional JAX has
no hooks; the models' ``taps`` mechanism IS the hook surface — every stage
checkpoint comes back from one jitted forward, and selection/normalization
run as vectorized jnp ops instead of per-channel python loops.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np


def topk_energy_channels(fm: np.ndarray, k: int = 16) -> Tuple[np.ndarray, np.ndarray]:
    """fm: [H, W, C] (one image) -> (indices[k], energies[k]) by channel L2
    energy, descending (ref: select_topk_channels, resnet18_feat.py:31-42)."""
    a = np.asarray(fm, np.float32)
    energy = np.sqrt((a * a).sum(axis=(0, 1)))
    k = min(k, a.shape[-1])
    idx = np.argsort(-energy)[:k]
    return idx, energy[idx]


def normalize_channel(ch: np.ndarray, eps: float = 1e-8) -> np.ndarray:
    """Per-channel min-max -> [0, 1] (ref: resnet18_feat.py:45-59)."""
    lo, hi = float(ch.min()), float(ch.max())
    return (ch - lo) / (hi - lo + eps)


def make_grid(channels: List[np.ndarray], ncols: int = 4, pad: int = 1) -> np.ndarray:
    """Tile [H, W] channel images into one grid image (torchvision
    make_grid capability, ref: resnet18_feat.py:62-83)."""
    n = len(channels)
    ncols = min(ncols, n)
    nrows = -(-n // ncols)
    H, W = channels[0].shape
    grid = np.ones((nrows * (H + pad) + pad, ncols * (W + pad) + pad), np.float32)
    for i, ch in enumerate(channels):
        r, c = divmod(i, ncols)
        y0 = pad + r * (H + pad)
        x0 = pad + c * (W + pad)
        grid[y0 : y0 + H, x0 : x0 + W] = ch
    return grid


def save_png(img01: np.ndarray, path: str, scale: int = 1) -> str:
    from PIL import Image

    arr = (np.clip(img01, 0, 1) * 255).astype(np.uint8)
    im = Image.fromarray(arr)
    if scale > 1:
        im = im.resize((arr.shape[1] * scale, arr.shape[0] * scale), Image.NEAREST)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    im.save(path)
    return path


def inspect_taps(
    taps: Dict[str, jnp.ndarray],
    out_dir: str,
    image_index: int = 0,
    topk: int = 16,
    ncols: int = 4,
    stages: Optional[List[str]] = None,
) -> Dict[str, Dict]:
    """Full inspection pass: for each NHWC stage tap, save a top-K-energy
    channel grid PNG and return the per-stage channel/energy report."""
    report: Dict[str, Dict] = {}
    for name, fm in taps.items():
        if stages is not None and name not in stages:
            continue
        a = np.asarray(fm)
        if a.ndim != 4:  # only spatial feature maps
            continue
        one = a[image_index]  # HWC
        idx, energy = topk_energy_channels(one, topk)
        chans = [normalize_channel(one[:, :, c]) for c in idx]
        path = save_png(make_grid(chans, ncols), os.path.join(out_dir, f"{name}_top{len(idx)}.png"))
        report[name] = {
            "png": path,
            "channels": idx.tolist(),
            "energies": [float(e) for e in energy],
            "shape": list(one.shape),
        }
    return report

"""ImageNet-style preprocessing, pure NumPy/PIL.

Mirrors the reference's torch-free pipeline (`tools/preprocess_to_bin.py:8-44`):
shorter-side resize to 256 (bilinear), center-crop 224, /255, per-channel
mean/std normalize — but emits NHWC (TPU layout) instead of NCHW, and
vectorizes over batches. `to_bin` keeps the raw-fp32-file interchange.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def imagenet_preprocess_np(
    img,  # PIL.Image or HWC uint8 array
    size: int = 224,
    resize_to: int = 256,
    mean: np.ndarray = IMAGENET_MEAN,
    std: np.ndarray = IMAGENET_STD,
) -> np.ndarray:
    """One image -> normalized fp32 NHWC [1, size, size, 3]."""
    from PIL import Image

    if isinstance(img, np.ndarray):
        img = Image.fromarray(img)
    img = img.convert("RGB")
    w, h = img.size
    if w <= h:
        nw, nh = resize_to, max(1, round(h * resize_to / w))
    else:
        nh, nw = resize_to, max(1, round(w * resize_to / h))
    img = img.resize((nw, nh), Image.BILINEAR)
    left = (nw - size) // 2
    top = (nh - size) // 2
    img = img.crop((left, top, left + size, top + size))
    x = np.asarray(img, np.float32) / 255.0  # HWC
    x = (x - mean) / std
    return x[None]  # NHWC


def preprocess_dir(
    image_dir: str,
    limit: Optional[int] = None,
    size: int = 224,
) -> Tuple[np.ndarray, list]:
    """Flat-list a directory of images (the bench harness's
    list_images_flat, `bench_fp32_vs_torch_e2e.py:40-49`) and preprocess."""
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    paths = sorted(
        os.path.join(image_dir, f)
        for f in os.listdir(image_dir)
        if os.path.splitext(f)[1].lower() in exts
    )
    if limit:
        paths = paths[:limit]
    from PIL import Image

    batch = np.concatenate([imagenet_preprocess_np(Image.open(p), size) for p in paths], 0)
    return batch, paths


def to_bin(x: np.ndarray, path: str) -> None:
    np.ascontiguousarray(x, np.float32).tofile(path)


def synthetic_imagenet(n: int, size: int = 224, seed: int = 0) -> np.ndarray:
    """Normalized-stats random NHWC batch for benches without the dataset."""
    rng = np.random.default_rng(seed)
    return rng.normal(0, 1, (n, size, size, 3)).astype(np.float32)

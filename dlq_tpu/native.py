"""ctypes bindings for the native runtime library (native/dlqio.cc).

Auto-builds `native/libdlqio.so` on first use if a toolchain exists; every
entry point has a NumPy fallback so the framework works without the native
layer (but the native paths are the production data-plane: threaded weight
loading, image preprocessing, int4 packing).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import List, Optional, Sequence, Tuple

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libdlqio.so")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], check=True,
                       capture_output=True, timeout=120)
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dlq_read_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.dlq_write_f32.argtypes = [ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64]
    lib.dlq_read_f32_many.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int64), ctypes.c_int,
    ]
    lib.dlq_preprocess_image.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
    ]
    lib.dlq_preprocess_batch.argtypes = [
        ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float), ctypes.c_int,
    ]
    lib.dlq_pack_int4.argtypes = [ctypes.POINTER(ctypes.c_int8), ctypes.c_int64,
                                  ctypes.c_int64, ctypes.POINTER(ctypes.c_uint8)]
    lib.dlq_unpack_int4.argtypes = [ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                                    ctypes.c_int64, ctypes.POINTER(ctypes.c_int8)]
    lib.dlq_now.restype = ctypes.c_double
    _lib = lib
    return _lib


def available() -> bool:
    return get_lib() is not None


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def read_f32(path: str, expect_elems: int) -> np.ndarray:
    lib = get_lib()
    if lib is None:
        data = np.fromfile(path, dtype=np.float32)
        if data.size != expect_elems:
            raise ValueError(f"{path}: {data.size} elems, expected {expect_elems}")
        return data
    out = np.empty(expect_elems, np.float32)
    r = lib.dlq_read_f32(path.encode(), _fptr(out), expect_elems)
    if r != 0:
        raise ValueError(f"dlq_read_f32({path}) failed: {r} (size mismatch or IO error)")
    return out


def read_f32_many(paths: Sequence[str], elems: Sequence[int], threads: int = 0
                  ) -> Tuple[np.ndarray, List[int]]:
    """Load many .bin files into one arena concurrently; returns (arena,
    offsets). This is the engine cold-start path for big weight stores."""
    offsets = np.zeros(len(paths), np.int64)
    total = 0
    for i, e in enumerate(elems):
        offsets[i] = total
        total += int(e)
    lib = get_lib()
    arena = np.empty(total, np.float32)
    if lib is None:
        for p, e, o in zip(paths, elems, offsets):
            arena[o : o + e] = read_f32(p, e)
        return arena, offsets.tolist()
    c_paths = (ctypes.c_char_p * len(paths))(*[p.encode() for p in paths])
    c_elems = np.asarray(elems, np.int64)
    r = lib.dlq_read_f32_many(
        c_paths, c_elems.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), len(paths),
        _fptr(arena), offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)), threads,
    )
    if r != 0:
        raise ValueError(f"dlq_read_f32_many failed: {r}")
    return arena, offsets.tolist()


def preprocess_batch_u8(
    images: Sequence[np.ndarray],  # HWC uint8, varying sizes
    resize_to: int = 256,
    size: int = 224,
    mean=(0.485, 0.456, 0.406),
    std=(0.229, 0.224, 0.225),
    threads: int = 0,
) -> np.ndarray:
    """Threaded native ImageNet preprocess -> NHWC fp32 [n, size, size, 3]."""
    lib = get_lib()
    n = len(images)
    out = np.empty((n, size, size, 3), np.float32)
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    if lib is None:
        from dlq_tpu.data.preprocess import imagenet_preprocess_np

        for i, im in enumerate(images):
            out[i] = imagenet_preprocess_np(im, size, resize_to, mean_a, std_a)[0]
        return out
    imgs = [np.ascontiguousarray(im, np.uint8) for im in images]
    ptrs = (ctypes.POINTER(ctypes.c_uint8) * n)(
        *[im.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)) for im in imgs]
    )
    shs = np.asarray([im.shape[0] for im in imgs], np.int32)
    sws = np.asarray([im.shape[1] for im in imgs], np.int32)
    r = lib.dlq_preprocess_batch(
        ptrs,
        shs.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        sws.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        n, _fptr(out), resize_to, size,
        _fptr(mean_a), _fptr(std_a), threads,
    )
    if r != 0:
        raise ValueError(f"dlq_preprocess_batch failed: {r}")
    return out


def pack_int4_native(q: np.ndarray) -> np.ndarray:
    lib = get_lib()
    q = np.ascontiguousarray(q, np.int8)
    if q.shape[0] % 2:
        raise ValueError("axis 0 must be even")
    out = np.empty((q.shape[0] // 2,) + q.shape[1:], np.uint8)
    if lib is None:
        lo = q[0::2].astype(np.uint8) & 0xF
        hi = (q[1::2].astype(np.uint8) & 0xF) << 4
        return lo | hi
    cols = int(np.prod(q.shape[1:])) if q.ndim > 1 else 1
    lib.dlq_pack_int4(q.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
                      q.shape[0], cols,
                      out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
    return out


def unpack_int4_native(packed: np.ndarray, rows: int) -> np.ndarray:
    lib = get_lib()
    packed = np.ascontiguousarray(packed, np.uint8)
    out = np.empty((rows,) + packed.shape[1:], np.int8)
    cols = int(np.prod(packed.shape[1:])) if packed.ndim > 1 else 1
    if lib is None:
        lo = (packed & 0xF).astype(np.int8)
        hi = ((packed >> 4) & 0xF).astype(np.int8)
        lo = np.where(lo >= 8, lo - 16, lo)
        hi = np.where(hi >= 8, hi - 16, hi)
        return np.stack([lo, hi], 1).reshape((-1,) + packed.shape[1:])[:rows].astype(np.int8)
    lib.dlq_unpack_int4(packed.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                        packed.shape[0], cols,
                        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return out

"""ctypes bindings for the native (C++) preprocessing kernels.

Builds ``librasterize.so`` on first use (g++ -O3, cached next to the
source); all entry points degrade gracefully to the Python implementations
in ``ugpg_tpu.data.rasterize`` when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = ["available", "rasterize_polygons_native", "rasterize_batch_native"]

_HERE = Path(__file__).parent
_SRC = _HERE / "rasterize.cpp"
_LIB = _HERE / "librasterize.so"
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_LIB), str(_SRC), "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - compiler missing
        print(f"native rasterizer build failed ({e}); using Python fallback")
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        lib = ctypes.CDLL(str(_LIB))
        lib.rasterize_polygons.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        lib.rasterize_batch.argtypes = [
            ctypes.POINTER(ctypes.c_double),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _pack(polygons):
    if polygons:
        vertices = np.concatenate([np.asarray(p, np.float64) for p in polygons])
    else:
        vertices = np.zeros((0, 2), np.float64)
    offsets = np.zeros(len(polygons) + 1, np.int64)
    for i, p in enumerate(polygons):
        offsets[i + 1] = offsets[i] + len(p)
    return np.ascontiguousarray(vertices), offsets


def rasterize_polygons_native(polygons, image_hw) -> np.ndarray:
    """C++ even-odd scanline fill; same semantics as the numpy fallback."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    h, w = image_hw
    vertices, offsets = _pack(polygons)
    mask = np.zeros((h, w), np.uint8)
    lib.rasterize_polygons(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(polygons),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
    )
    return mask


def rasterize_batch_native(per_image_polygons, image_hw, n_threads: int = 0):
    """Parallel batch rasterization: list-of-list-of-polygons -> (N, H, W)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native rasterizer unavailable")
    h, w = image_hw
    all_polys = [p for image in per_image_polygons for p in image]
    vertices, poly_offsets = _pack(all_polys)
    image_offsets = np.zeros(len(per_image_polygons) + 1, np.int64)
    for i, image in enumerate(per_image_polygons):
        image_offsets[i + 1] = image_offsets[i] + len(image)
    masks = np.zeros((len(per_image_polygons), h, w), np.uint8)
    lib.rasterize_batch(
        vertices.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        poly_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        image_offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(per_image_polygons),
        masks.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        h,
        w,
        n_threads,
    )
    return masks

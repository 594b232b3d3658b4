"""ctypes bindings for the native (C++) preprocessing kernels.

Three components, each built on first use (g++ -O3, cached next to the
source) and degrading gracefully to the Python/PIL implementations when no
compiler is available:

* ``librasterize.so`` — even-odd scanline polygon rasterization (the
  XML-annotation -> mask hot path; see ``rasterize.cpp``).
* ``libpngdec.so`` — 8-bit RGB PNG decode (the aug-patch dataset's
  per-sample decode hot path; see ``png_decode.cpp``).  ctypes releases
  the GIL during the call, so the threaded DataLoader decodes batches in
  true parallel.
* ``libtiffdec.so`` — whole-slide TIFF decode (the native-resolution
  eval/fine-tune per-slide hot path; see ``tiff_decode.cpp``).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path

import numpy as np

__all__ = [
    "available",
    "rasterize_polygons_native",
    "rasterize_batch_native",
    "png_available",
    "decode_png_native",
    "tiff_available",
    "decode_tiff_native",
]

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


# ---------------------------------------------------------------------------
# PNG decoder (libpngdec.so)
# ---------------------------------------------------------------------------

_PNG_SRC = _HERE / "png_decode.cpp"
_PNG_LIB = _HERE / "libpngdec.so"
_png_lib = None
_png_tried = False


def _png_build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_PNG_LIB), str(_PNG_SRC), "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - compiler/zlib missing
        print(f"native png decoder build failed ({e}); using PIL fallback")
        return False


def _png_load():
    global _png_lib, _png_tried
    with _lock:
        if _png_lib is not None or _png_tried:
            return _png_lib
        _png_tried = True
        if not _PNG_LIB.exists() or _PNG_LIB.stat().st_mtime < _PNG_SRC.stat().st_mtime:
            if not _png_build():
                return None
        lib = ctypes.CDLL(str(_PNG_LIB))
        lib.png_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.png_info.restype = ctypes.c_int
        lib.png_decode_rgb8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.png_decode_rgb8.restype = ctypes.c_int
        _png_lib = lib
        return _png_lib


def png_available() -> bool:
    return _png_load() is not None


def decode_png_native(source) -> np.ndarray | None:
    """Decode an 8-bit RGB non-interlaced PNG -> (H, W, 3) uint8.

    ``source``: a path or a bytes object.  Returns None when the file uses
    a PNG feature outside the supported profile (callers fall back to PIL)
    and raises only on I/O errors.
    """
    lib = _png_load()
    if lib is None:
        return None
    if isinstance(source, (str, os.PathLike)):
        data = Path(source).read_bytes()
    else:
        data = bytes(source)
    buf = np.frombuffer(data, np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    ctype = ctypes.c_int()
    depth = ctypes.c_int()
    if lib.png_info(ptr, len(data), ctypes.byref(h), ctypes.byref(w),
                    ctypes.byref(ctype), ctypes.byref(depth)) != 0:
        return None
    if ctype.value != 2 or depth.value != 8:
        return None  # outside the supported profile
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.png_decode_rgb8(
        ptr, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
    )
    return out if rc == 0 else None


# ---------------------------------------------------------------------------
# TIFF decoder (libtiffdec.so)
# ---------------------------------------------------------------------------

_TIFF_SRC = _HERE / "tiff_decode.cpp"
_TIFF_LIB = _HERE / "libtiffdec.so"
_tiff_lib = None
_tiff_tried = False


def _tiff_build() -> bool:
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", str(_TIFF_LIB), str(_TIFF_SRC), "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except Exception as e:  # pragma: no cover - compiler/zlib missing
        print(f"native tiff decoder build failed ({e}); using PIL fallback")
        return False


def _tiff_load():
    global _tiff_lib, _tiff_tried
    with _lock:
        if _tiff_lib is not None or _tiff_tried:
            return _tiff_lib
        _tiff_tried = True
        if not _TIFF_LIB.exists() or _TIFF_LIB.stat().st_mtime < _TIFF_SRC.stat().st_mtime:
            if not _tiff_build():
                return None
        lib = ctypes.CDLL(str(_TIFF_LIB))
        lib.tiff_info.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.tiff_info.restype = ctypes.c_int
        lib.tiff_decode_rgb8.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
        ]
        lib.tiff_decode_rgb8.restype = ctypes.c_int
        _tiff_lib = lib
        return _tiff_lib


def tiff_available() -> bool:
    return _tiff_load() is not None


def decode_tiff_native(source) -> np.ndarray | None:
    """Decode a whole-slide TIFF -> (H, W, 3) uint8 RGB.

    Supported profile (everything MoNuSeg-style slides use; see
    tiff_decode.cpp): classic TIFF, first IFD, strip-based chunky layout,
    8-bit gray/RGB/RGBA, compression None/LZW(+predictor 2)/Deflate/
    PackBits, either byte order.  ``source``: a path or a bytes object.
    Returns None when the file is outside the profile (callers fall back
    to PIL) and raises only on I/O errors.
    """
    lib = _tiff_load()
    if lib is None:
        return None
    if isinstance(source, (str, os.PathLike)):
        data = Path(source).read_bytes()
    else:
        data = bytes(source)
    buf = np.frombuffer(data, np.uint8)
    ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    h = ctypes.c_int64()
    w = ctypes.c_int64()
    spp = ctypes.c_int()
    comp = ctypes.c_int()
    if lib.tiff_info(ptr, len(data), ctypes.byref(h), ctypes.byref(w),
                     ctypes.byref(spp), ctypes.byref(comp)) != 0:
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    rc = lib.tiff_decode_rgb8(
        ptr, len(data),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
    )
    return out if rc == 0 else None

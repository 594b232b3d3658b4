"""ctypes bindings for the native (C++) preprocessing kernels.

Four components, each built on first use (g++ -O3, cached next to the
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
* ``libbmpdec.so`` — Herlev cell-image BMP decode (``bmp_decode.cpp``).
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
    "bmp_available",
    "decode_bmp_native",
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
# Image decoders (libpngdec.so, libtiffdec.so) — shared build/bind factory
# ---------------------------------------------------------------------------
#
# Both decoders expose the same C ABI shape:
#   <fmt>_info(data, len, *h, *w, *a, *b) -> 0 iff readable
#   <fmt>_decode_rgb8(data, len, out, out_cap) -> 0 on success
# so one factory owns the compile-on-first-use, mtime staleness check,
# lock discipline, and path/bytes handling for all of them.


def _make_decoder(src_name: str, lib_name: str, ldflags: list,
                  info_sym: str, decode_sym: str, profile_ok):
    """Returns ``(available, decode)`` for one native decoder library.

    ``profile_ok(a, b)``: extra predicate over the two trailing int outputs
    of the info call (e.g. PNG color type / bit depth) — the decode returns
    None (PIL fallback) when it rejects.
    """
    src = _HERE / src_name
    lib_path = _HERE / lib_name
    state = {"fns": None, "tried": False}

    def _build() -> bool:
        cmd = [
            "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
            "-o", str(lib_path), str(src), *ldflags,
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            return True
        except Exception as e:  # pragma: no cover - compiler/zlib missing
            print(f"native {src_name} build failed ({e}); using PIL fallback")
            return False

    def _load():
        with _lock:
            if state["fns"] is not None or state["tried"]:
                return state["fns"]
            state["tried"] = True
            if not lib_path.exists() or lib_path.stat().st_mtime < src.stat().st_mtime:
                if not _build():
                    return None
            lib = ctypes.CDLL(str(lib_path))
            info = getattr(lib, info_sym)
            info.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64),
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            info.restype = ctypes.c_int
            decode = getattr(lib, decode_sym)
            decode.argtypes = [
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ]
            decode.restype = ctypes.c_int
            state["fns"] = (info, decode)
            return state["fns"]

    def available() -> bool:
        return _load() is not None

    def decode_rgb8(source):
        fns = _load()
        if fns is None:
            return None
        info, decode = fns
        if isinstance(source, (str, os.PathLike)):
            data = Path(source).read_bytes()
        else:
            data = bytes(source)
        buf = np.frombuffer(data, np.uint8)
        ptr = buf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
        h = ctypes.c_int64()
        w = ctypes.c_int64()
        a = ctypes.c_int()
        b = ctypes.c_int()
        if info(ptr, len(data), ctypes.byref(h), ctypes.byref(w),
                ctypes.byref(a), ctypes.byref(b)) != 0:
            return None
        if not profile_ok(a.value, b.value):
            return None
        out = np.empty((h.value, w.value, 3), np.uint8)
        rc = decode(
            ptr, len(data),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), out.size,
        )
        return out if rc == 0 else None

    return available, decode_rgb8


# info outputs: (color_type, bit_depth) — 8-bit RGB only; other PNG
# profiles fall back to PIL
png_available, _decode_png = _make_decoder(
    "png_decode.cpp", "libpngdec.so", ["-lz"], "png_info",
    "png_decode_rgb8", lambda color_type, depth: color_type == 2 and depth == 8,
)

# info outputs: (samples_per_pixel, compression) — tiff_info already
# returns nonzero for anything outside the supported profile
tiff_available, _decode_tiff = _make_decoder(
    "tiff_decode.cpp", "libtiffdec.so", ["-lz"], "tiff_info",
    "tiff_decode_rgb8", lambda spp, comp: True,
)


# info outputs: (bitcount, compression) — bmp_info already returns nonzero
# outside the supported profile (24/32-bit BI_RGB)
bmp_available, _decode_bmp = _make_decoder(
    "bmp_decode.cpp", "libbmpdec.so", [], "bmp_info",
    "bmp_decode_rgb8", lambda bitcount, comp: True,
)


def decode_png_native(source) -> np.ndarray | None:
    """Decode an 8-bit RGB non-interlaced PNG -> (H, W, 3) uint8.

    ``source``: a path or a bytes object.  Returns None when the file uses
    a PNG feature outside the supported profile (callers fall back to PIL)
    and raises only on I/O errors.
    """
    return _decode_png(source)


def decode_tiff_native(source) -> np.ndarray | None:
    """Decode a whole-slide TIFF -> (H, W, 3) uint8 RGB.

    Supported profile (everything MoNuSeg-style slides use; see
    tiff_decode.cpp): classic TIFF, first IFD, strip-based chunky layout,
    8-bit gray/RGB/RGBA, compression None/LZW(+predictor 2)/Deflate/
    PackBits, either byte order.  ``source``: a path or a bytes object.
    Returns None when the file is outside the profile (callers fall back
    to PIL) and raises only on I/O errors.
    """
    return _decode_tiff(source)


def decode_bmp_native(source) -> np.ndarray | None:
    """Decode a Herlev-style BMP -> (H, W, 3) uint8 RGB.

    Supported profile (see bmp_decode.cpp): 'BM' + BITMAPINFOHEADER,
    24/32-bit uncompressed BI_RGB, bottom-up or top-down.  ``source``: a
    path or a bytes object.  Returns None when the file is outside the
    profile (callers fall back to PIL) and raises only on I/O errors.
    """
    return _decode_bmp(source)

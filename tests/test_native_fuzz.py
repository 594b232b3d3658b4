"""Adversarial-input robustness for the native C++ decoders.

The decoders parse UNTRUSTED bytes in-process (datasets downloaded by the
user); a parsing bug is a segfault that takes the trainer down — or worse.
These tests sweep truncations, random byte corruptions, and garbage bodies
through every decoder and assert the only observable outcomes are (a) a
clean ``None`` (out-of-profile / corrupt → caller falls back to PIL) or
(b) a well-formed ``(H, W, 3) uint8`` array.  A crash here fails the whole
pytest process by design — that is the bug being hunted.

Deterministic (seeded) so failures reproduce; sized to run in seconds.
"""

from __future__ import annotations

import io

import numpy as np
import pytest

from ugpg_tpu.native import (
    bmp_available,
    decode_bmp_native,
    decode_png_native,
    decode_tiff_native,
    png_available,
    tiff_available,
)

pytestmark = pytest.mark.skipif(
    not (png_available() and tiff_available() and bmp_available()),
    reason="native decoders unavailable (no compiler)",
)


def _pil_bytes(fmt: str, **save_kw) -> bytes:
    from PIL import Image

    rng = np.random.default_rng(7)
    img = Image.fromarray(rng.integers(0, 256, (37, 53, 3), np.uint8))
    buf = io.BytesIO()
    img.save(buf, format=fmt, **save_kw)
    return buf.getvalue()


def _decoders_and_fixtures():
    return [
        (decode_png_native, "png", _pil_bytes("PNG")),
        (decode_tiff_native, "tiff-none", _pil_bytes("TIFF")),
        (decode_tiff_native, "tiff-lzw", _pil_bytes("TIFF", compression="tiff_lzw")),
        (decode_tiff_native, "tiff-packbits",
         _pil_bytes("TIFF", compression="packbits")),
        (decode_bmp_native, "bmp", _pil_bytes("BMP")),
    ]


def _check(decode, data: bytes) -> None:
    out = decode(data)
    if out is not None:
        assert isinstance(out, np.ndarray)
        assert out.dtype == np.uint8
        assert out.ndim == 3 and out.shape[2] == 3
        # bomb guards cap total pixels at 64 MPix in every decoder
        assert out.shape[0] * out.shape[1] <= 1 << 26


@pytest.mark.parametrize(
    "decode,name,data",
    [pytest.param(d, n, b, id=n) for d, n, b in _decoders_and_fixtures()],
)
def test_truncation_sweep(decode, name, data):
    """Every prefix cut must decode to None or a valid array — no crash."""
    assert decode(data) is not None  # the intact fixture is in-profile
    n = len(data)
    cuts = sorted({0, 1, 2, 3, n - 1, n - 2, *range(4, n, max(1, n // 64))})
    for cut in cuts:
        _check(decode, data[:cut])


@pytest.mark.parametrize(
    "decode,name,data",
    [pytest.param(d, n, b, id=n) for d, n, b in _decoders_and_fixtures()],
)
def test_byte_corruption_sweep(decode, name, data):
    """Seeded random byte flips anywhere in the file (headers, IFD offsets,
    strip tables, compressed payload) must never crash the process."""
    rng = np.random.default_rng(42)
    buf = bytearray(data)
    for _ in range(200):
        k = int(rng.integers(1, 9))
        idx = rng.integers(0, len(buf), size=k)
        old = [(int(i), buf[int(i)]) for i in idx]
        for i in idx:
            buf[int(i)] = int(rng.integers(0, 256))
        _check(decode, bytes(buf))
        for i, v in old:  # restore: mutations stay independent
            buf[i] = v


@pytest.mark.parametrize(
    "decode,name,data",
    [pytest.param(d, n, b, id=n) for d, n, b in _decoders_and_fixtures()],
)
def test_garbage_body_after_valid_magic(decode, name, data):
    """Valid magic + random tail: exercises header parsing on noise (pure
    random bytes rarely pass the signature check, so keep the magic)."""
    rng = np.random.default_rng(3)
    magic = data[:8]
    for size in (0, 1, 16, 128, 4096):
        tail = rng.integers(0, 256, size, np.uint8).tobytes()
        _check(decode, magic + tail)
    # and pure noise for completeness
    for size in (0, 8, 1024):
        _check(decode, rng.integers(0, 256, size, np.uint8).tobytes())

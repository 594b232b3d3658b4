"""Native C++ rasterizer: build, parity with numpy fallback, batch API."""

import numpy as np
import pytest

from ugpg_tpu.data.rasterize import _fill_polygon_numpy, rasterize_polygons
from ugpg_tpu.native import (
    available,
    rasterize_batch_native,
    rasterize_polygons_native,
)

pytestmark = pytest.mark.skipif(not available(), reason="no C++ toolchain")


def _polys(rng, n=30, size=200):
    out = []
    for _ in range(n):
        c = rng.uniform(20, size - 20, 2)
        r = rng.uniform(4, 15)
        ang = np.sort(rng.uniform(0, 2 * np.pi, 10))
        out.append(np.stack([c[0] + r * np.cos(ang), c[1] + r * np.sin(ang)], 1))
    return out


def test_native_matches_numpy_fallback(rng):
    polys = _polys(rng)
    got = rasterize_polygons_native(polys, (200, 200))
    want = np.zeros((200, 200), np.uint8)
    for p in polys:
        _fill_polygon_numpy(want, p)
    np.testing.assert_array_equal(got, want)


def test_native_close_to_pil(rng):
    polys = _polys(rng)
    native = rasterize_polygons_native(polys, (200, 200))
    pil = rasterize_polygons(polys, (200, 200), backend="pil")
    diff = np.abs(native.astype(int) - pil.astype(int)).sum()
    assert diff < 0.12 * max(int(pil.sum()), 1)  # boundary ring only


def test_backend_dispatch(rng):
    polys = _polys(rng, n=5)
    a = rasterize_polygons(polys, (200, 200), backend="native")
    b = rasterize_polygons(polys, (200, 200), backend="numpy")
    np.testing.assert_array_equal(a, b)


def test_batch_parallel_matches_single(rng):
    images = [_polys(rng, n=8) for _ in range(5)]
    batch = rasterize_batch_native(images, (128, 128), n_threads=3)
    assert batch.shape == (5, 128, 128)
    for i, polys in enumerate(images):
        np.testing.assert_array_equal(
            batch[i], rasterize_polygons_native(polys, (128, 128))
        )


def test_empty_polygons():
    assert rasterize_polygons_native([], (16, 16)).sum() == 0
    assert rasterize_batch_native([[], []], (16, 16)).sum() == 0


# ---------------------------------------------------------------------------
# native PNG decoder
# ---------------------------------------------------------------------------


def test_png_decode_bit_exact_vs_pil():
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_png_native, png_available

    if not png_available():
        import pytest

        pytest.skip("no compiler/zlib for the native decoder")
    g = np.random.default_rng(0)
    for shape in ((64, 64, 3), (100, 37, 3), (1, 1, 3), (256, 255, 3)):
        img = (g.random(shape) * 255).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="PNG")
        got = decode_png_native(b.getvalue())
        assert got is not None
        np.testing.assert_array_equal(got, img)
    # gradient images exercise Sub/Up/Average/Paeth row filters
    yy, xx = np.mgrid[0:128, 0:128]
    grad = np.stack([yy, xx, (yy + xx) // 2], -1).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(grad).save(b, format="PNG")
    np.testing.assert_array_equal(decode_png_native(b.getvalue()), grad)


def test_png_decode_unsupported_profiles_return_none(tmp_path):
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_png_native, png_available

    if not png_available():
        import pytest

        pytest.skip("no compiler/zlib for the native decoder")
    g = np.random.default_rng(1)
    # grayscale (color type 0) and RGBA (6): outside the profile
    for mode, shape in (("L", (16, 16)), ("RGBA", (16, 16, 4))):
        img = (g.random(shape) * 255).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(img, mode=mode).save(b, format="PNG")
        assert decode_png_native(b.getvalue()) is None
    # garbage bytes
    assert decode_png_native(b"not a png at all") is None


def test_dataset_png_path_uses_native_decoder(tmp_path):
    """AugMoNuSeg-style PNG samples decode identically through the dataset."""
    from PIL import Image

    from tests.test_data_monuseg import SQUARE, make_xml
    from ugpg_tpu.data.monuseg import MoNuSegDataset

    g = np.random.default_rng(2)
    root = tmp_path / "M"
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "annots").mkdir(parents=True)
    img = (g.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "train" / "images" / "a.png")
    (root / "train" / "annots" / "a.xml").write_text(make_xml([SQUARE]))
    ds = MoNuSegDataset(str(root), image_size=64, split="train", augment=False)
    raw_img, mask = ds.load_raw(0)
    np.testing.assert_array_equal(raw_img, img)
    x, y = ds[0]
    assert x.shape == (64, 64, 3) and 0.0 <= x.min() and x.max() <= 1.0


def _tiff_or_skip():
    import pytest

    from ugpg_tpu.native import tiff_available

    if not tiff_available():
        pytest.skip("no compiler/zlib for the native tiff decoder")


def test_tiff_decode_bit_exact_vs_pil():
    """Whole-slide profile: RGB strips, every compression PIL can write."""
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    g = np.random.default_rng(3)
    # mix of random (stresses LZW table growth via Clear codes) and
    # gradient (stresses long runs / predictor-like data) content
    yy, xx = np.mgrid[0:200, 0:173]
    grad = np.stack([yy % 256, xx % 256, (yy + xx) % 256], -1).astype(np.uint8)
    images = [
        (g.random((100, 100, 3)) * 255).astype(np.uint8),
        grad,
        (g.random((1, 1, 3)) * 255).astype(np.uint8),
        np.zeros((33, 65, 3), np.uint8),  # constant: max-run compression
    ]
    for img in images:
        for comp in (None, "tiff_lzw", "packbits", "tiff_deflate"):
            b = io.BytesIO()
            kw = {"compression": comp} if comp else {}
            Image.fromarray(img).save(b, format="TIFF", **kw)
            got = decode_tiff_native(b.getvalue())
            assert got is not None, (img.shape, comp)
            np.testing.assert_array_equal(got, img, err_msg=str(comp))


def test_tiff_decode_gray_and_rgba_match_pil_convert():
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    g = np.random.default_rng(4)
    gray = (g.random((40, 56)) * 255).astype(np.uint8)
    rgba = (g.random((40, 56, 4)) * 255).astype(np.uint8)
    rgba[..., 3] = 255  # PIL convert("RGB") on opaque RGBA == drop alpha
    for arr, mode in ((gray, "L"), (rgba, "RGBA")):
        for comp in (None, "tiff_lzw"):
            b = io.BytesIO()
            kw = {"compression": comp} if comp else {}
            Image.fromarray(arr, mode=mode).save(b, format="TIFF", **kw)
            data = b.getvalue()
            got = decode_tiff_native(data)
            assert got is not None, (mode, comp)
            want = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
            np.testing.assert_array_equal(got, want, err_msg=f"{mode} {comp}")


def test_tiff_decode_multi_strip_and_big_endian():
    """RowsPerStrip < H forces multiple strips; MM is the big-endian order."""
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    g = np.random.default_rng(5)
    img = (g.random((64, 48, 3)) * 255).astype(np.uint8)
    b = io.BytesIO()
    # libtiff path honors tiffinfo RowsPerStrip (278)
    Image.fromarray(img).save(b, format="TIFF", compression="tiff_lzw",
                              tiffinfo={278: 8})
    got = decode_tiff_native(b.getvalue())
    assert got is not None
    np.testing.assert_array_equal(got, img)

    # hand-craft a tiny big-endian (MM) uncompressed RGB TIFF
    import struct

    h, w = 2, 3
    px = bytes(range(h * w * 3))
    entries = [
        (256, 3, 1, w << 16),            # ImageWidth (SHORT, left-packed)
        (257, 3, 1, h << 16),            # ImageLength
        (258, 3, 3, 0),                  # BitsPerSample -> offset, patched
        (259, 3, 1, 1 << 16),            # Compression = none
        (262, 3, 1, 2 << 16),            # Photometric = RGB
        (273, 4, 1, 0),                  # StripOffsets -> patched
        (277, 3, 1, 3 << 16),            # SamplesPerPixel
        (278, 3, 1, h << 16),            # RowsPerStrip
        (279, 4, 1, len(px)),            # StripByteCounts
    ]
    ifd_off = 8
    ifd_len = 2 + 12 * len(entries) + 4
    bits_off = ifd_off + ifd_len
    data_off = bits_off + 6
    entries[2] = (258, 3, 3, bits_off)
    entries[5] = (273, 4, 1, data_off)
    buf = struct.pack(">2sHI", b"MM", 42, ifd_off)
    buf += struct.pack(">H", len(entries))
    for tag, typ, cnt, val in entries:
        buf += struct.pack(">HHII", tag, typ, cnt, val)
    buf += struct.pack(">I", 0)  # next IFD
    buf += struct.pack(">HHH", 8, 8, 8)
    buf += px
    got = decode_tiff_native(buf)
    assert got is not None
    np.testing.assert_array_equal(
        got, np.frombuffer(px, np.uint8).reshape(h, w, 3)
    )


def test_tiff_decode_unsupported_profiles_return_none(tmp_path):
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    # 16-bit: outside the profile
    img16 = (np.random.default_rng(6).random((8, 8)) * 65535).astype(np.uint16)
    b = io.BytesIO()
    Image.fromarray(img16).save(b, format="TIFF")
    assert decode_tiff_native(b.getvalue()) is None
    # garbage bytes
    assert decode_tiff_native(b"not a tiff at all") is None
    # truncated file: header promises data that is not there
    img = (np.random.default_rng(7).random((32, 32, 3)) * 255).astype(np.uint8)
    b = io.BytesIO()
    Image.fromarray(img).save(b, format="TIFF")
    assert decode_tiff_native(b.getvalue()[: len(b.getvalue()) // 2]) is None


def test_dataset_tiff_path_uses_native_decoder(tmp_path):
    """MoNuSeg-style .tif slides decode identically through the dataset."""
    from PIL import Image

    from tests.test_data_monuseg import SQUARE, make_xml
    from ugpg_tpu.data.monuseg import MoNuSegDataset

    g = np.random.default_rng(8)
    root = tmp_path / "M"
    (root / "train" / "images").mkdir(parents=True)
    (root / "train" / "annots").mkdir(parents=True)
    img = (g.random((64, 64, 3)) * 255).astype(np.uint8)
    Image.fromarray(img).save(root / "train" / "images" / "a.tif",
                              compression="tiff_lzw")
    (root / "train" / "annots" / "a.xml").write_text(make_xml([SQUARE]))
    ds = MoNuSegDataset(str(root), image_size=64, split="train", augment=False)
    raw_img, mask = ds.load_raw(0)
    np.testing.assert_array_equal(raw_img, img)


def _craft_tiff_le(w, h, spp, payload, extra_entries=()):
    """Hand-build a little-endian classic TIFF: one uncompressed strip."""
    import struct

    entries = [
        (256, 3, 1, w),            # ImageWidth
        (257, 3, 1, h),            # ImageLength
        (259, 3, 1, 1),            # Compression = none
        (277, 3, 1, spp),          # SamplesPerPixel
        (278, 3, 1, h),            # RowsPerStrip
        (279, 4, 1, len(payload)),  # StripByteCounts
    ]
    entries.extend(extra_entries)
    needs_bits_off = spp > 2
    n = len(entries) + 2 + (0 if not needs_bits_off else 0)  # + bits, offsets
    entries.append((258, 3, spp, 0))   # BitsPerSample (patched if indirect)
    entries.append((273, 4, 1, 0))     # StripOffsets (patched)
    entries.sort()
    n = len(entries)
    ifd_off = 8
    ifd_len = 2 + 12 * n + 4
    bits_off = ifd_off + ifd_len
    data_off = bits_off + 2 * spp
    fixed = []
    for tag, typ, cnt, val in entries:
        if tag == 258:
            val = (8 | (8 << 16)) if spp <= 2 else bits_off  # inline if fits
        if tag == 258 and spp == 1:
            val = 8
        if tag == 273:
            val = data_off
        fixed.append((tag, typ, cnt, val))
    import struct
    buf = struct.pack("<2sHI", b"II", 42, ifd_off)
    buf += struct.pack("<H", n)
    for tag, typ, cnt, val in fixed:
        buf += struct.pack("<HHII", tag, typ, cnt, val)
    buf += struct.pack("<I", 0)
    buf += struct.pack("<" + "H" * spp, *([8] * spp))
    buf += bytes(payload)
    return buf


def test_tiff_decode_horizontal_predictor():
    """Predictor 2 (tag 317): payload stores per-row horizontal diffs."""
    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    g = np.random.default_rng(9)
    img = (g.random((5, 7, 3)) * 255).astype(np.uint8)
    diff = img.astype(np.int16).reshape(5, 7 * 3).copy()
    # horizontal differencing per sample: d[x] = v[x] - v[x - spp]
    flat = img.reshape(5, 21).astype(np.int16)
    diff[:, 3:] = flat[:, 3:] - flat[:, :-3]
    payload = (diff % 256).astype(np.uint8).tobytes()
    data = _craft_tiff_le(7, 5, 3, payload,
                          extra_entries=[(262, 3, 1, 2), (317, 3, 1, 2)])
    got = decode_tiff_native(data)
    assert got is not None
    np.testing.assert_array_equal(got, img)


def test_tiff_decode_white_is_zero():
    """Photometric 0 (WhiteIsZero): gray samples are inverted."""
    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    g = np.random.default_rng(10)
    gray = (g.random((4, 6)) * 255).astype(np.uint8)
    data = _craft_tiff_le(6, 4, 1, gray.tobytes(),
                          extra_entries=[(262, 3, 1, 0)])
    got = decode_tiff_native(data)
    assert got is not None
    want = np.repeat((255 - gray)[..., None], 3, axis=-1)
    np.testing.assert_array_equal(got, want)


def test_tiff_decode_bomb_header_rejected():
    """A tiny file claiming huge dims must return None, not allocate."""
    from ugpg_tpu.native import decode_tiff_native

    _tiff_or_skip()
    data = _craft_tiff_le(65536, 65536, 3, b"\x00" * 12)
    assert decode_tiff_native(data) is None


# ---------------------------------------------------------------------------
# native BMP decoder (Herlev cell images)
# ---------------------------------------------------------------------------


def _bmp_or_skip():
    import pytest

    from ugpg_tpu.native import bmp_available

    if not bmp_available():
        pytest.skip("no compiler for the native bmp decoder")


def test_bmp_decode_bit_exact_vs_pil():
    import io

    from PIL import Image

    from ugpg_tpu.native import decode_bmp_native

    _bmp_or_skip()
    g = np.random.default_rng(11)
    # odd widths exercise the 4-byte row padding
    for shape in ((32, 32, 3), (17, 31, 3), (1, 1, 3), (45, 3, 3)):
        img = (g.random(shape) * 255).astype(np.uint8)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="BMP")
        got = decode_bmp_native(b.getvalue())
        assert got is not None, shape
        np.testing.assert_array_equal(got, img, err_msg=str(shape))


def _craft_bmp(img, top_down, bpp):
    """Hand-build a BMP (PIL only writes bottom-up 24-bit)."""
    import struct

    h, w = img.shape[:2]
    stride = ((w * bpp // 8) + 3) // 4 * 4
    rows = []
    order = range(h) if top_down else range(h - 1, -1, -1)
    for y in order:
        row = bytearray()
        for x in range(w):
            r, g, b = img[y, x]
            px = bytes((b, g, r)) + (b"\xff" if bpp == 32 else b"")
            row += px
        row += b"\x00" * (stride - len(row))
        rows.append(bytes(row))
    pixels = b"".join(rows)
    height_field = -h if top_down else h
    hdr = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, height_field, 1, bpp, 0,
                       len(pixels), 2835, 2835, 0, 0)
    return hdr + info + pixels


def test_bmp_decode_top_down_and_32bit():
    from ugpg_tpu.native import decode_bmp_native

    _bmp_or_skip()
    g = np.random.default_rng(12)
    img = (g.random((9, 7, 3)) * 255).astype(np.uint8)
    for top_down in (False, True):
        for bpp in (24, 32):
            data = _craft_bmp(img, top_down, bpp)
            got = decode_bmp_native(data)
            assert got is not None, (top_down, bpp)
            np.testing.assert_array_equal(got, img,
                                          err_msg=f"td={top_down} bpp={bpp}")


def test_bmp_decode_unsupported_and_garbage():
    from ugpg_tpu.native import decode_bmp_native

    _bmp_or_skip()
    assert decode_bmp_native(b"not a bmp") is None
    # truncated pixel data
    g = np.random.default_rng(13)
    img = (g.random((16, 16, 3)) * 255).astype(np.uint8)
    data = _craft_bmp(img, False, 24)
    assert decode_bmp_native(data[: len(data) - 40]) is None


def test_herlev_dataset_bmp_path_uses_native_decoder(tmp_path):
    """Folder-per-class BMPs decode through the dataset identically."""
    import io

    from PIL import Image

    from tests.test_data_herlev import write_herlev_tree
    from ugpg_tpu.data.herlev import HerlevDataset

    root = write_herlev_tree(tmp_path / "H")
    ds = HerlevDataset(str(root), image_size=32, split="train", augment=False,
                       verbose=False)
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and 0.0 <= x.min() and x.max() <= 1.0
    # the on-disk sample decodes identically native vs PIL
    from ugpg_tpu.native import decode_bmp_native

    p = ds.samples[0]
    if str(p).lower().endswith(".bmp"):
        want = np.asarray(Image.open(p).convert("RGB"))
        np.testing.assert_array_equal(decode_bmp_native(p), want)

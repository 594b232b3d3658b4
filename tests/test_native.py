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

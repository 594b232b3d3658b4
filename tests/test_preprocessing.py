"""Preprocessing/QC utils + offline augmentation pipeline tests."""

import numpy as np
import pytest
from PIL import Image

from ugpg_tpu.cli.augment_monuseg import (
    augment_patch,
    crop_polygons,
    extract_patches,
    polygons_to_xml,
    run_pipeline,
)
from ugpg_tpu.data.monuseg import AugMoNuSegDataset, MoNuSegDataset
from ugpg_tpu.data.preprocessing import (
    analyze_dataset,
    check_data_integrity,
    create_data_quality_report,
    visualize_samples,
)
from ugpg_tpu.data.rasterize import parse_polygons, rasterize_polygons

from tests.test_data_monuseg import make_xml, write_monuseg_tree


@pytest.fixture
def root(tmp_path):
    return write_monuseg_tree(tmp_path / "M", n_train=3, n_val=2, size=64)


def test_analyze_dataset(root):
    ds = MoNuSegDataset(str(root), image_size=32, split="train")
    stats = analyze_dataset(ds)
    assert stats["num_samples"] == 3
    assert stats["nuclei_per_image"]["mean"] == 2.0  # square + triangle
    assert stats["mask_coverage"]["mean"] > 0.0
    assert stats["nucleus_area_px"]["mean"] > 50


def test_quality_report_and_viz(root, tmp_path):
    ds = MoNuSegDataset(str(root), image_size=32, split="train")
    out = tmp_path / "qc" / "report.png"
    stats = create_data_quality_report(ds, str(out))
    assert out.exists() and stats["num_samples"] == 3
    viz = visualize_samples(ds, [0, 1], str(tmp_path / "qc" / "samples.png"))
    assert viz and (tmp_path / "qc" / "samples.png").exists()


def test_integrity_check(root):
    report = check_data_integrity(str(root))
    assert report["ok"]
    assert report["splits"]["train"]["num_images"] == 3
    # break pairing
    (root / "train" / "annots" / "train_0.xml").unlink()
    report = check_data_integrity(str(root))
    assert not report["ok"]
    assert report["splits"]["train"]["unpaired_images"] == ["train_0"]


def test_extract_patches_grid():
    img = np.zeros((256, 256, 3), np.uint8)
    polys = [np.array([(10.0, 10.0), (40.0, 10.0), (40.0, 40.0)])]
    tiles = list(extract_patches(img, polys, patch=128, stride=64))
    assert len(tiles) == 9  # 3x3 grid
    # polygon lands only in patches covering the top-left corner
    with_poly = [t for t in tiles if t[1]]
    assert len(with_poly) >= 1
    for tile, tp, (x0, y0) in with_poly:
        assert x0 <= 40 and y0 <= 40


def test_crop_polygons_translation():
    polys = [np.array([(100.0, 100.0), (120.0, 100.0), (110.0, 130.0)])]
    out = crop_polygons(polys, 90, 95, 64)
    assert len(out) == 1
    np.testing.assert_allclose(out[0][0], [10.0, 5.0])
    assert not crop_polygons(polys, 200, 200, 64)  # fully outside


def test_polygons_to_xml_roundtrip(tmp_path):
    polys = [np.array([(1.5, 2.5), (20.0, 3.0), (10.0, 25.0)])]
    xml = polygons_to_xml(polys)
    p = tmp_path / "x.xml"
    p.write_text(xml)
    back = parse_polygons(p)
    assert len(back) == 1
    np.testing.assert_allclose(back[0], polys[0], atol=0.01)


def test_augment_patch_properties(rng):
    np_rng = np.random.default_rng(7)
    img = (np_rng.random((64, 64, 3)) * 255).astype(np.uint8)
    polys = [np.array([(10.0, 10.0), (30.0, 10.0), (30.0, 30.0), (10.0, 30.0)])]
    for seed in range(5):
        aug_img, aug_polys = augment_patch(img, polys, np.random.default_rng(seed))
        assert aug_img.shape == img.shape and aug_img.dtype == np.uint8
        for p in aug_polys:
            assert p[:, 0].min() >= 0 and p[:, 0].max() <= 63
            assert p[:, 1].min() >= 0 and p[:, 1].max() <= 63
        # mask area roughly preserved under geometric ops
        m0 = rasterize_polygons(polys, (64, 64)).sum()
        m1 = rasterize_polygons(aug_polys, (64, 64)).sum()
        assert m1 > 0.3 * m0


def test_run_pipeline_and_dataset_consumes_it(root):
    n = run_pipeline(str(root), patch=32, stride=32, variants=2, seed=0)
    assert n == 3 * 4 * 3  # 3 images x (2x2 grid) x (1 orig + 2 variants)
    ds = AugMoNuSegDataset(str(root), image_size=32, split="train")
    assert len(ds) == n
    img, mask = ds[0]
    assert img.shape == (32, 32, 3)


def test_numpy_gaussian_filter_matches_scipy():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    from ugpg_tpu.cli.augment_monuseg import _gaussian_filter2d

    g = np.random.default_rng(0)
    img = g.uniform(-1, 1, (64, 64))
    for sigma in (1.0, 5.0):
        want = scipy_nd.gaussian_filter(img, sigma)
        got = _gaussian_filter2d(img, sigma)
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-9)


def test_numpy_bilinear_remap_matches_scipy_map_coordinates():
    scipy_nd = pytest.importorskip("scipy.ndimage")
    from ugpg_tpu.cli.augment_monuseg import _bilinear_sample

    g = np.random.default_rng(1)
    plane = g.uniform(0, 255, (32, 32))
    # in-range, boundary-crossing, and negative coordinates
    ys = g.uniform(-3, 35, (40, 40))
    xs = g.uniform(-3, 35, (40, 40))
    want = scipy_nd.map_coordinates(plane, [ys, xs], order=1, mode="reflect")
    got = _bilinear_sample(plane, ys, xs)
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-8)


def test_elastic_and_grid_no_scipy(monkeypatch):
    """The offline pipeline must not import scipy at all."""
    import builtins
    import sys

    real_import = builtins.__import__

    def deny_scipy(name, *a, **kw):
        if name.startswith("scipy"):
            raise ImportError("scipy blocked for this test")
        return real_import(name, *a, **kw)

    monkeypatch.setattr(builtins, "__import__", deny_scipy)
    from ugpg_tpu.cli.augment_monuseg import _elastic, _grid_distortion

    g = np.random.default_rng(2)
    img = (g.uniform(0, 255, (64, 64, 3))).astype(np.uint8)
    polys = [np.array([[10.0, 10.0], [20.0, 10.0], [15.0, 20.0]])]
    w1, p1 = _elastic(img, polys, 64, np.random.default_rng(3))
    w2, p2 = _grid_distortion(img, polys, 64, np.random.default_rng(4))
    assert w1.shape == img.shape and w2.shape == img.shape
    assert w1.dtype == np.uint8
    for p in p1 + p2:
        assert p.shape == polys[0].shape

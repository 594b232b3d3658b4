"""Data layer tests: XML rasterization, MoNuSeg dataset, loader.

Uses tiny hand-written XML fixtures (SURVEY.md §4 test plan).
"""

import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ugpg_tpu.data.loader import DataLoader, prefetch_to_device
from ugpg_tpu.data.monuseg import (
    AugMoNuSegDataset,
    MoNuSegDataset,
    create_train_val_split,
)
from ugpg_tpu.data.rasterize import (
    annotation_info,
    parse_polygons,
    rasterize_polygons,
    xml_to_mask,
)

XML_TEMPLATE = """<?xml version="1.0"?>
<Annotations MicronsPerPixel="0.25">
  <Annotation><Regions>{regions}</Regions></Annotation>
</Annotations>"""

REGION_TEMPLATE = "<Region><Vertices>{verts}</Vertices></Region>"


def make_xml(polys):
    regions = []
    for poly in polys:
        verts = "".join(f'<Vertex X="{x}" Y="{y}"/>' for x, y in poly)
        regions.append(REGION_TEMPLATE.format(verts=verts))
    return XML_TEMPLATE.format(regions="".join(regions))


SQUARE = [(10, 10), (30, 10), (30, 30), (10, 30)]
TRIANGLE = [(40, 40), (60, 40), (50, 58)]


def write_monuseg_tree(root: Path, n_train=4, n_val=2, size=64):
    rng = np.random.default_rng(0)
    for split, n in (("train", n_train), ("val", n_val)):
        (root / split / "images").mkdir(parents=True, exist_ok=True)
        (root / split / "annots").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (rng.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / split / "images" / f"{split}_{i}.tif")
            (root / split / "annots" / f"{split}_{i}.xml").write_text(
                make_xml([SQUARE, TRIANGLE])
            )
    return root


@pytest.fixture
def monuseg_root(tmp_path):
    return write_monuseg_tree(tmp_path / "MoNuSeg")


def test_parse_polygons_and_info(tmp_path):
    p = tmp_path / "a.xml"
    p.write_text(make_xml([SQUARE, TRIANGLE, [(0, 0), (1, 1)]]))  # degenerate last
    polys = parse_polygons(p)
    assert len(polys) == 2  # <3 vertices skipped (ref: monuseg_dataset.py:119)
    assert polys[0].shape == (4, 2)
    info = annotation_info(p)
    assert info["num_nuclei"] == 3  # count includes degenerate regions
    assert info["microns_per_pixel"] == 0.25


def test_rasterize_square_interior():
    mask = rasterize_polygons([np.asarray(SQUARE, float)], (64, 64))
    assert mask.dtype == np.uint8
    assert mask[20, 20] == 1
    assert mask[5, 5] == 0
    assert mask[20, 29] == 1 and mask[20, 31] == 0
    # area close to 20x20 square
    assert 380 <= mask.sum() <= 460


def test_xml_to_mask_matches_pil_reference(tmp_path):
    """Our rasterizer must equal direct PIL polygon fill (the reference's
    exact method) on the same polygons."""
    from PIL import ImageDraw

    p = tmp_path / "b.xml"
    polys = [SQUARE, TRIANGLE, [(2.5, 3.5), (20.2, 5.1), (15.7, 25.9)]]
    p.write_text(make_xml(polys))
    got = xml_to_mask(p, (64, 64))
    ref = Image.new("L", (64, 64), 0)
    d = ImageDraw.Draw(ref)
    for poly in polys:
        d.polygon([tuple(map(float, pt)) for pt in poly], fill=1)
    np.testing.assert_array_equal(got, np.asarray(ref))


def test_numpy_fallback_close_to_pil():
    from ugpg_tpu.data.rasterize import _fill_polygon_numpy

    poly = np.asarray(SQUARE, float)
    mask = np.zeros((64, 64), np.uint8)
    _fill_polygon_numpy(mask, poly)
    pil = rasterize_polygons([poly], (64, 64))
    # allow boundary-pixel differences only
    assert np.abs(mask.astype(int) - pil.astype(int)).sum() < 90


def test_monuseg_dataset_basic(monuseg_root):
    ds = MoNuSegDataset(str(monuseg_root), image_size=32, split="train")
    assert len(ds) == 4
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert mask.shape == (32, 32, 1)
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert set(np.unique(mask)).issubset({0.0, 1.0})  # nearest keeps binary
    info = ds.get_sample_info(0)
    assert info["num_nuclei"] == 2 and info["original_size"] == (64, 64)


def test_monuseg_skips_orphans(monuseg_root, capsys):
    os.remove(monuseg_root / "train" / "annots" / "train_0.xml")
    ds = MoNuSegDataset(str(monuseg_root), image_size=32, split="train")
    assert len(ds) == 3
    assert "no matching annotation" in capsys.readouterr().out


def test_monuseg_empty_raises(tmp_path):
    (tmp_path / "train" / "images").mkdir(parents=True)
    (tmp_path / "train" / "annots").mkdir(parents=True)
    with pytest.raises(RuntimeError):
        MoNuSegDataset(str(tmp_path), split="train")


def test_update_image_size(monuseg_root):
    ds = MoNuSegDataset(str(monuseg_root), image_size=32, split="val")
    ds.update_image_size(16)
    img, mask = ds[0]
    assert img.shape == (16, 16, 3)


def test_create_train_val_split(tmp_path):
    root = write_monuseg_tree(tmp_path / "M2", n_train=10, n_val=0)
    import shutil

    shutil.rmtree(root / "val")
    create_train_val_split(str(root), val_ratio=0.2, seed=42)
    assert len(os.listdir(root / "val" / "images")) == 2
    assert len(os.listdir(root / "val" / "annots")) == 2
    # copy (not move) by default
    assert len(os.listdir(root / "train" / "images")) == 10


def test_aug_dataset_reads_aug_dirs(tmp_path):
    root = tmp_path / "M3"
    (root / "train" / "aug" / "images").mkdir(parents=True)
    (root / "train" / "aug" / "annots").mkdir(parents=True)
    rng = np.random.default_rng(1)
    for i in range(3):
        img = (rng.random((32, 32, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "aug" / "images" / f"p{i}.png")
        (root / "train" / "aug" / "annots" / f"p{i}.xml").write_text(
            make_xml([[(4, 4), (12, 4), (12, 12), (4, 12)]])
        )
    ds = AugMoNuSegDataset(str(root), image_size=32, split="train", augment=True)
    assert len(ds) == 3 and ds.augment
    img, mask = ds[1]
    assert img.shape == (32, 32, 3)
    assert mask.sum() > 0


def test_dataloader_batching(monuseg_root):
    ds = MoNuSegDataset(str(monuseg_root), image_size=32, split="train")
    dl = DataLoader(ds, batch_size=3, shuffle=True, num_workers=2)
    batches = list(dl)
    assert len(batches) == 2
    assert batches[0][0].shape == (3, 32, 32, 3)
    assert batches[1][0].shape == (1, 32, 32, 3)
    dl2 = DataLoader(ds, batch_size=3, drop_last=True)
    assert len(list(dl2)) == 1


def test_prefetch_to_device(monuseg_root):
    import jax

    ds = MoNuSegDataset(str(monuseg_root), image_size=32, split="val")
    dl = DataLoader(ds, batch_size=2)
    out = list(prefetch_to_device(iter(dl), size=2))
    assert len(out) == 1
    assert isinstance(out[0][0], jax.Array)

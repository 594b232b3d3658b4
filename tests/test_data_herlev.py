"""Herlev dataset tests: class structure, stratified splits, weights."""

import json
import os
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from ugpg_tpu.data.herlev import (
    BINARY_MAPPING,
    CLASS_NAMES,
    HerlevDataset,
    create_herlev_splits,
)

COUNTS = {  # per-class sample counts in the synthetic tree
    "carcinoma_in_situ": 10,
    "light_dysplastic": 8,
    "moderate_dysplastic": 6,
    "normal_columnar": 10,
    "normal_intermediate": 4,
    "normal_superficiel": 6,
    "severe_dysplastic": 8,
}


def write_herlev_tree(root: Path, presplit=False):
    rng = np.random.default_rng(0)
    base = root / "train" if not presplit else root
    for cls, n in COUNTS.items():
        if presplit:
            for split, frac in (("train", 0.5), ("val", 0.25), ("test", 0.25)):
                d = root / split / cls
                d.mkdir(parents=True, exist_ok=True)
                for i in range(int(n * frac)):
                    img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
                    Image.fromarray(img).save(d / f"{cls}_{split}_{i}.bmp")
        else:
            d = base / cls
            d.mkdir(parents=True, exist_ok=True)
            for i in range(n):
                img = (rng.random((20, 24, 3)) * 255).astype(np.uint8)
                Image.fromarray(img).save(d / f"{cls}_{i}.bmp")
    return root


@pytest.fixture
def herlev_root(tmp_path):
    return write_herlev_tree(tmp_path / "Herlev")


def test_stratified_split_sizes(herlev_root):
    tr = HerlevDataset(str(herlev_root), split="train", verbose=False)
    va = HerlevDataset(str(herlev_root), split="val", verbose=False)
    te = HerlevDataset(str(herlev_root), split="test", verbose=False)
    total = sum(COUNTS.values())
    assert len(tr) + len(va) + len(te) == total
    # split is deterministic (seed 42)
    tr2 = HerlevDataset(str(herlev_root), split="train", verbose=False)
    assert tr.samples == tr2.samples
    # splits are disjoint
    assert not (set(tr.samples) & set(va.samples))
    assert not (set(tr.samples) & set(te.samples))


def test_item_shape_and_range(herlev_root):
    ds = HerlevDataset(str(herlev_root), image_size=32, split="train", verbose=False)
    img, label = ds[0]
    assert img.shape == (32, 32, 3) and img.dtype == np.float32
    assert 0.0 <= img.min() and img.max() <= 1.0
    assert 0 <= label < 7


def test_binary_mapping(herlev_root):
    ds = HerlevDataset(
        str(herlev_root), split="train", binary_classification=True, verbose=False
    )
    assert set(ds.labels) == {0, 1}
    n_abnormal_classes = sum(BINARY_MAPPING[c] for c in CLASS_NAMES)
    assert n_abnormal_classes == 4


def test_class_weights_inverse_frequency(herlev_root):
    ds = HerlevDataset(str(herlev_root), split="train", verbose=False)
    w = ds.get_class_weights()
    assert w.shape == (7,)
    counts = np.bincount(ds.labels, minlength=7)
    want = len(ds.labels) / (7 * counts)
    np.testing.assert_allclose(w, want, rtol=1e-6)
    # rarest class gets the largest weight
    assert np.argmax(w) == np.argmin(counts)


def test_presplit_directory_loading(tmp_path):
    root = write_herlev_tree(tmp_path / "HPre", presplit=True)
    ds = HerlevDataset(str(root), split="val", verbose=False)
    assert len(ds) > 0
    assert all("val" in s for s in ds.samples)


def test_save_split_info(herlev_root, tmp_path):
    ds = HerlevDataset(str(herlev_root), split="train", verbose=False)
    out = ds.save_split_info(str(tmp_path))
    info = json.loads(Path(out).read_text())
    assert info["total_samples"] == len(ds)
    assert sum(info["class_distribution"].values()) == len(ds)


def test_create_herlev_splits_materializes(herlev_root, tmp_path):
    out = tmp_path / "splits"
    create_herlev_splits(str(herlev_root), str(out))
    for split in ("train", "val", "test"):
        assert (out / f"{split}_split_info.json").exists()
    # files copied under class dirs
    assert any((out / "train").rglob("*.bmp"))


def test_corrupted_image_fallback(herlev_root):
    ds = HerlevDataset(str(herlev_root), image_size=16, split="train", verbose=False)
    # corrupt the first file
    Path(ds.samples[0]).write_bytes(b"not an image")
    img, label = ds[0]
    assert img.shape == (16, 16, 3)
    assert img.max() == 0.0  # black fallback (ref: herlev_dataset.py:245-250)


def test_missing_structure_raises(tmp_path):
    (tmp_path / "empty").mkdir()
    with pytest.raises(RuntimeError):
        HerlevDataset(str(tmp_path / "empty"), verbose=False)

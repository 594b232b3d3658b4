"""Herlev Pap-smear dataset: folder-per-class loader + stratified splits.

Behavior parity with the reference loader (ref: Herlev/herlev_dataset.py:
31-403): fixed 7-class list, binary normal/abnormal mapping, pre-split
directory or in-memory stratified seeded (42) 70/20/10 splits, inverse-
frequency class weights, corrupted-image fallback to a black image, split
info JSON, and on-disk split materialization.

TPU-first split: the dataset yields float32 [0,1] RGB at the target size;
train-time augmentation AND ImageNet normalization run on device inside the
fused train step (``ugpg_tpu.data.augment``) — same math as the reference's
torchvision transform stack, executed as one XLA program per batch.
"""

from __future__ import annotations

import json
import os
import random
import shutil
from pathlib import Path
from typing import Any, Dict, Optional

import numpy as np

__all__ = ["HerlevDataset", "create_herlev_splits", "CLASS_NAMES", "BINARY_MAPPING"]

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False

CLASS_NAMES = [
    "carcinoma_in_situ",
    "light_dysplastic",
    "moderate_dysplastic",
    "normal_columnar",
    "normal_intermediate",
    "normal_superficiel",
    "severe_dysplastic",
]

# normal (0) vs abnormal (1) grouping (ref: herlev_dataset.py:53-61)
BINARY_MAPPING = {
    "carcinoma_in_situ": 1,
    "light_dysplastic": 1,
    "moderate_dysplastic": 1,
    "normal_columnar": 0,
    "normal_intermediate": 0,
    "normal_superficiel": 0,
    "severe_dysplastic": 1,
}

_IMG_EXTS = (".bmp", ".png", ".jpg", ".jpeg", ".tif")


class HerlevDataset:
    """Cervical-cell classification dataset."""

    CLASS_NAMES = CLASS_NAMES
    BINARY_MAPPING = BINARY_MAPPING

    def __init__(
        self,
        data_dir: str,
        image_size=224,
        split: str = "train",
        transform: bool = True,
        augment: bool = True,
        binary_classification: bool = False,
        normalize: bool = True,
        target_split_ratio: Optional[Dict[str, float]] = None,
        verbose: bool = True,
    ):
        if not _HAVE_PIL:
            raise RuntimeError("HerlevDataset requires PIL")
        self.data_dir = data_dir
        self.image_size = (
            image_size if isinstance(image_size, tuple) else (image_size, image_size)
        )
        self.split = split
        self.transform = transform
        self.augment = augment and split == "train"
        self.binary_classification = binary_classification
        self.normalize = normalize

        self.class_to_idx = {c: i for i, c in enumerate(CLASS_NAMES)}
        self.idx_to_class = {i: c for c, i in self.class_to_idx.items()}

        self.samples: list[str] = []
        self.labels: list[int] = []
        self._load(target_split_ratio)

        if verbose:
            print(f"Herlev {split} dataset loaded: {len(self.samples)} samples")
            uniq, counts = np.unique(self.labels, return_counts=True)
            for lab, cnt in zip(uniq, counts):
                name = (
                    ("abnormal" if lab == 1 else "normal")
                    if binary_classification
                    else self.idx_to_class[int(lab)]
                )
                print(f"    {name}: {cnt}")

    # -- loading ----------------------------------------------------------
    def _label_for(self, class_name: str) -> int:
        if self.binary_classification:
            return BINARY_MAPPING[class_name]
        return self.class_to_idx[class_name]

    def _add_class_dir(self, class_dir: str, class_name: str, files=None):
        files = files if files is not None else sorted(
            f for f in os.listdir(class_dir) if f.lower().endswith(_IMG_EXTS)
        )
        for f in files:
            self.samples.append(os.path.join(class_dir, f))
            self.labels.append(self._label_for(class_name))

    def _load(self, ratios: Optional[Dict[str, float]]):
        # Treat the tree as pre-split only when BOTH train/ and val/ hold
        # class dirs.  (The reference checks just data_dir/<split>, which
        # makes 'train' swallow ALL files of a raw class-structured tree
        # while val/test get stratified slices of the same files — a
        # train/val overlap; ref: herlev_dataset.py:117-135.  We deviate
        # deliberately: raw class trees are stratified for every split.)
        def _has_classes(d):
            return os.path.isdir(d) and any(
                os.path.isdir(os.path.join(d, c)) for c in CLASS_NAMES
            )

        presplit = _has_classes(os.path.join(self.data_dir, "train")) and _has_classes(
            os.path.join(self.data_dir, "val")
        )
        split_dir = os.path.join(self.data_dir, self.split)
        if presplit and _has_classes(split_dir):
            for class_name in CLASS_NAMES:
                cdir = os.path.join(split_dir, class_name)
                if os.path.isdir(cdir):
                    self._add_class_dir(cdir, class_name)
            return

        base = None
        train_dir = os.path.join(self.data_dir, "train")
        if os.path.isdir(train_dir) and any(
            os.path.isdir(os.path.join(train_dir, c)) for c in CLASS_NAMES
        ):
            base = train_dir
        elif any(
            os.path.isdir(os.path.join(self.data_dir, c)) for c in CLASS_NAMES
        ):
            base = self.data_dir
        if base is None:
            raise RuntimeError(
                f"Cannot find valid Herlev dataset structure in {self.data_dir}"
            )

        ratios = ratios or {"train": 0.7, "val": 0.2, "test": 0.1}
        rng = random.Random(42)  # reproducible stratified splits (ref :170)
        for class_name in CLASS_NAMES:
            cdir = os.path.join(base, class_name)
            if not os.path.isdir(cdir):
                continue
            files = sorted(
                f for f in os.listdir(cdir) if f.lower().endswith(_IMG_EXTS)
            )
            rng.shuffle(files)
            n = len(files)
            n_train = int(n * ratios["train"])
            n_val = int(n * ratios["val"])
            if self.split == "train":
                chosen = files[:n_train]
            elif self.split == "val":
                chosen = files[n_train : n_train + n_val]
            elif self.split == "test":
                chosen = files[n_train + n_val :]
            else:
                raise ValueError(f"Unknown split: {self.split}")
            self._add_class_dir(cdir, class_name, chosen)

    # -- access -------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.samples)

    def __getitem__(self, idx: int) -> tuple[np.ndarray, int]:
        path = self.samples[idx]
        label = self.labels[idx]
        try:
            image = None
            if str(path).lower().endswith(".bmp"):
                # native C++ decode for the Herlev BMP hot path (GIL-free,
                # parallel in the threaded loader); PIL still does the
                # resize below so interpolation semantics are unchanged
                from ugpg_tpu.native import decode_bmp_native

                arr8 = decode_bmp_native(path)
                if arr8 is not None:
                    image = Image.fromarray(arr8)
            if image is None:
                image = Image.open(path).convert("RGB")
        except Exception as e:  # corrupted-image fallback (ref :245-250)
            print(f"Error loading image {path}: {e}")
            image = Image.new("RGB", self.image_size[::-1], color=(0, 0, 0))
        if self.transform:
            image = image.resize(self.image_size[::-1], Image.BILINEAR)
        arr = np.asarray(image, dtype=np.float32) / 255.0
        return arr, label

    def get_class_weights(self) -> np.ndarray:
        """Inverse-frequency weights (ref: herlev_dataset.py:262-280)."""
        n_classes = 2 if self.binary_classification else len(CLASS_NAMES)
        counts = np.bincount(self.labels, minlength=n_classes)
        total = len(self.labels)
        with np.errstate(divide="ignore"):
            w = total / (n_classes * counts)
        return w.astype(np.float32)

    def get_sample_info(self, idx: int) -> dict[str, Any]:
        path = self.samples[idx]
        label = self.labels[idx]
        try:
            with Image.open(path) as im:
                original_size = im.size
        except Exception:
            original_size = (0, 0)
        if self.binary_classification:
            class_name = "abnormal" if label == 1 else "normal"
        else:
            class_name = self.idx_to_class[label]
        return {
            "image_path": path,
            "filename": os.path.basename(path),
            "label": int(label),
            "class_name": class_name,
            "original_size": original_size,
            "target_size": self.image_size,
        }

    def save_split_info(self, output_dir: str):
        """Split manifest JSON (ref: herlev_dataset.py:309-340)."""
        os.makedirs(output_dir, exist_ok=True)
        uniq, counts = np.unique(self.labels, return_counts=True)
        dist = {}
        for lab, cnt in zip(uniq, counts):
            name = (
                ("abnormal" if lab == 1 else "normal")
                if self.binary_classification
                else self.idx_to_class[int(lab)]
            )
            dist[name] = int(cnt)
        info = {
            "split": self.split,
            "total_samples": len(self.samples),
            "binary_classification": self.binary_classification,
            "class_distribution": dist,
            "samples": [self.get_sample_info(i) for i in range(len(self.samples))],
        }
        out = os.path.join(output_dir, f"{self.split}_split_info.json")
        with open(out, "w") as f:
            json.dump(info, f, indent=2)
        print(f"Split information saved to: {out}")
        return out


def create_herlev_splits(
    data_dir: str,
    output_dir: str,
    split_ratios: Optional[Dict[str, float]] = None,
    copy_files: bool = True,
):
    """Materialize stratified splits to disk (ref: herlev_dataset.py:343-403)."""
    split_ratios = split_ratios or {"train": 0.7, "val": 0.2, "test": 0.1}
    for split in ("train", "val", "test"):
        ds = HerlevDataset(
            data_dir,
            split=split,
            target_split_ratio=split_ratios,
            transform=False,
            verbose=False,
        )
        ds.save_split_info(output_dir)
        if copy_files:
            for i in range(len(ds)):
                info = ds.get_sample_info(i)
                cdir = Path(output_dir) / split / info["class_name"]
                cdir.mkdir(parents=True, exist_ok=True)
                dst = cdir / info["filename"]
                if not dst.exists():
                    shutil.copy2(info["image_path"], dst)
    print(f"Dataset splits created successfully in: {output_dir}")

"""MoNuSeg dataset: TIFF images + XML polygon annotations -> (image, mask).

Host-side decode/rasterize matching the reference loader's observable
behavior (ref: MoNuSegImprove/monuseg_dataset.py:21-242):

* pairs ``{split}/images/*.tif`` with ``{split}/annots/*.xml`` by basename,
  warns and skips orphans, errors when nothing pairs up
* XML polygons rasterized at full resolution then resized (bilinear for
  image, NEAREST for mask)
* returns float32 NHWC image in [0,1] and float32 (H, W, 1) mask

TPU-first split of responsibilities: the *dataset* does deterministic
decode+rasterize+resize only; train-time augmentation (flips/rotation/color
jitter) runs **on device** as one fused XLA program per batch
(``ugpg_tpu.data.augment.augment_monuseg_batch``) — the ``augment`` flag
here records intent for the loader/trainer.  A per-sample host RNG seed is
unnecessary: image/mask geometric consistency is guaranteed by construction
(single key drives both).
"""

from __future__ import annotations

import os
import random
import shutil
from pathlib import Path
from typing import Any

import numpy as np

from ugpg_tpu.data.rasterize import annotation_info, parse_polygons, rasterize_polygons


def _load_rgb(img_path: str) -> "np.ndarray":
    """Decode an image to (H, W, 3) uint8.

    PNGs (the aug-patch format) and TIFFs (the whole-slide format the
    native-resolution eval/fine-tune path reads per epoch) go through the
    native C++ decoders when available — the per-sample decode is the
    host-side hot path, and ctypes releases the GIL so the threaded
    DataLoader decodes in true parallel.  Everything else (and unsupported
    PNG/TIFF profiles) uses PIL."""
    low = str(img_path).lower()
    if low.endswith(".png"):
        try:
            from ugpg_tpu.native import decode_png_native

            arr = decode_png_native(img_path)
            if arr is not None:
                return arr
        except Exception:
            pass  # fall through to PIL
    elif low.endswith((".tif", ".tiff")):
        try:
            from ugpg_tpu.native import decode_tiff_native

            arr = decode_tiff_native(img_path)
            if arr is not None:
                return arr
        except Exception:
            pass  # fall through to PIL
    return np.asarray(Image.open(img_path).convert("RGB"))

load_rgb = _load_rgb  # public: eval/CLI surfaces read slides through it too

__all__ = ["MoNuSegDataset", "AugMoNuSegDataset", "create_train_val_split",
           "load_rgb"]

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False

_IMG_EXTS = (".tif", ".tiff", ".png")


def _resize_pil(arr_img: "Image.Image", size: int, nearest: bool) -> np.ndarray:
    resample = Image.NEAREST if nearest else Image.BILINEAR
    return np.asarray(arr_img.resize((size, size), resample))


class MoNuSegDataset:
    """Nuclei segmentation dataset (images + XML polygon annotations)."""

    def __init__(
        self,
        data_dir: str,
        image_size: int = 256,
        split: str = "train",
        transform: bool = True,
        augment: bool = True,
        images_subdir: str = "images",
        annots_subdir: str = "annots",
    ):
        if not _HAVE_PIL:
            raise RuntimeError("MoNuSegDataset requires PIL for TIFF decode")
        self.data_dir = data_dir
        self.image_size = image_size
        self.split = split
        self.transform = transform
        # augmentation intent; applied on-device by the training pipeline
        self.augment = augment and split == "train"

        self.images_dir = os.path.join(data_dir, split, images_subdir)
        self.annotations_dir = os.path.join(data_dir, split, annots_subdir)

        names = sorted(
            f
            for f in os.listdir(self.images_dir)
            if f.lower().endswith(_IMG_EXTS)
        )
        self.samples: list[tuple[str, str]] = []
        missing = []
        for img_name in names:
            stem = img_name.rsplit(".", 1)[0]
            annot = os.path.join(self.annotations_dir, stem + ".xml")
            if os.path.exists(annot):
                self.samples.append((os.path.join(self.images_dir, img_name), annot))
            else:
                missing.append(img_name)
        if missing:
            print(
                f"Warning: {len(missing)} images have no matching annotation "
                f"and will be skipped (examples: {missing[:5]})"
            )
        if not self.samples:
            raise RuntimeError(
                f"No image-annotation pairs found in "
                f"{self.images_dir} / {self.annotations_dir}"
            )
        self.image_files = [os.path.basename(p) for p, _ in self.samples]
        self.annotation_files = [os.path.basename(a) for _, a in self.samples]
        print(f"MoNuSeg {split} dataset: {len(self.samples)} samples")

    def __len__(self) -> int:
        return len(self.samples)

    def load_raw(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Full-resolution (image uint8 HWC, mask uint8 HW)."""
        img_path, annot_path = self.samples[idx]
        img_np = _load_rgb(img_path)
        h, w = img_np.shape[:2]
        mask = rasterize_polygons(parse_polygons(annot_path), (h, w))
        return img_np, mask

    def __getitem__(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        img_path, annot_path = self.samples[idx]
        raw = _load_rgb(img_path)
        image = Image.fromarray(raw)  # no decode cost; PIL used for resize
        h, w = raw.shape[:2]
        mask = rasterize_polygons(parse_polygons(annot_path), (h, w))
        if self.transform:
            img_np = _resize_pil(image, self.image_size, nearest=False)
            mask_np = _resize_pil(
                Image.fromarray(mask), self.image_size, nearest=True
            )
        else:
            img_np = np.asarray(image)
            mask_np = mask
        image_f = img_np.astype(np.float32) / 255.0
        mask_f = mask_np.astype(np.float32)[..., None]
        return image_f, mask_f

    def update_image_size(self, new_size: int):
        """Progressive resolution switching (ref: monuseg_dataset.py:217-221)."""
        self.image_size = new_size
        print(f"Updated dataset image size to {new_size}x{new_size}")

    def get_sample_info(self, idx: int) -> dict[str, Any]:
        img_path, annot_path = self.samples[idx]
        with Image.open(img_path) as im:
            size = im.size
        info = annotation_info(annot_path)
        return {
            "image_file": os.path.basename(img_path),
            "annotation_file": os.path.basename(annot_path),
            "original_size": size,
            **info,
        }


class AugMoNuSegDataset(MoNuSegDataset):
    """Pre-augmented patch dataset reading ``{split}/aug/{images,annots}``
    (ref: aug_monuseg_dataset.py:22-188).  Identical API; ``augment=True``
    applies on-device augmentation regardless of split."""

    def __init__(
        self,
        data_dir: str,
        image_size: int = 256,
        split: str = "train",
        transform: bool = True,
        augment: bool = True,
    ):
        super().__init__(
            data_dir,
            image_size=image_size,
            split=split,
            transform=transform,
            augment=False,
            images_subdir=os.path.join("aug", "images"),
            annots_subdir=os.path.join("aug", "annots"),
        )
        # aug dataset augments whenever asked, no split gate (ref behavior)
        self.augment = augment


def create_train_val_split(
    data_dir: str, val_ratio: float = 0.2, seed: int = 42, move: bool = False
):
    """One-time seeded 80/20 split of train/ into val/
    (ref: monuseg_dataset.py:245-299)."""
    train_dir = Path(data_dir) / "train"
    val_dir = Path(data_dir) / "val"
    (val_dir / "images").mkdir(parents=True, exist_ok=True)
    (val_dir / "annots").mkdir(parents=True, exist_ok=True)

    image_files = sorted(
        f for f in os.listdir(train_dir / "images") if f.lower().endswith(_IMG_EXTS)
    )
    rng = random.Random(seed)
    n_val = int(len(image_files) * val_ratio)
    val_files = rng.sample(image_files, n_val)

    op = shutil.move if move else shutil.copy2
    for img_file in val_files:
        stem = img_file.rsplit(".", 1)[0]
        annot_file = stem + ".xml"
        op(str(train_dir / "images" / img_file), str(val_dir / "images" / img_file))
        src_annot = train_dir / "annots" / annot_file
        if src_annot.exists():
            op(str(src_annot), str(val_dir / "annots" / annot_file))
    print(
        f"Train/Val split complete: train={len(os.listdir(train_dir / 'images'))}, "
        f"val={len(os.listdir(val_dir / 'images'))}"
    )

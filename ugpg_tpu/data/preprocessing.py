"""MoNuSeg analysis / QC / visualization utilities.

Re-implements the reference's preprocessing toolkit
(ref: MoNuSegImprove/preprocessing_utils.py): dataset statistics
(``analyze_dataset``, ref: :63-136), sample overlays
(``visualize_samples``, ref: :139-199), the multi-panel quality report
(``create_data_quality_report``, ref: :202-291) and structural integrity
checks (``check_data_integrity``, ref: :294-365).  ``xml_to_mask`` lives in
``ugpg_tpu.data.rasterize`` (single rasterizer, no duplicated copy — the
reference keeps two identical ones).
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np

from ugpg_tpu.data.rasterize import parse_polygons, rasterize_polygons, xml_to_mask

__all__ = [
    "analyze_dataset",
    "visualize_samples",
    "create_data_quality_report",
    "check_data_integrity",
]

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


def _polygon_area(poly: np.ndarray) -> float:
    x, y = poly[:, 0], poly[:, 1]
    return 0.5 * abs(float(np.dot(x, np.roll(y, 1)) - np.dot(y, np.roll(x, 1))))


def analyze_dataset(dataset, max_samples: int | None = None) -> dict:
    """Nuclei counts/areas and mask coverage stats (ref: :63-136)."""
    counts, areas, coverages = [], [], []
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        _, annot_path = dataset.samples[i]
        polys = parse_polygons(annot_path)
        counts.append(len(polys))
        areas.extend(_polygon_area(p) for p in polys)
        info = dataset.get_sample_info(i)
        w, h = info["original_size"]
        mask = rasterize_polygons(polys, (h, w))
        coverages.append(float(mask.mean()))
    areas = np.asarray(areas) if areas else np.zeros(1)
    counts_a = np.asarray(counts) if counts else np.zeros(1)
    return {
        "num_samples": n,
        "nuclei_per_image": {
            "mean": float(counts_a.mean()),
            "std": float(counts_a.std()),
            "min": int(counts_a.min()),
            "max": int(counts_a.max()),
        },
        "nucleus_area_px": {
            "mean": float(areas.mean()),
            "std": float(areas.std()),
            "min": float(areas.min()),
            "max": float(areas.max()),
        },
        "mask_coverage": {
            "mean": float(np.mean(coverages)) if coverages else 0.0,
            "std": float(np.std(coverages)) if coverages else 0.0,
        },
        "counts": counts,
        "coverages": coverages,
    }


def visualize_samples(dataset, indices, output_path: str):
    """Image / mask / overlay panels (ref: :139-199)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    rows = len(indices)
    fig, axes = plt.subplots(rows, 3, figsize=(12, 4 * rows))
    axes = np.atleast_2d(axes)
    for r, idx in enumerate(indices):
        image, mask = dataset.load_raw(idx)
        axes[r, 0].imshow(image)
        axes[r, 0].set_title(f"Image {idx}")
        axes[r, 1].imshow(mask, cmap="gray")
        axes[r, 1].set_title("Mask")
        axes[r, 2].imshow(image)
        axes[r, 2].imshow(mask, alpha=0.4, cmap="Reds")
        axes[r, 2].set_title("Overlay")
        for c in range(3):
            axes[r, c].axis("off")
    fig.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=100, bbox_inches="tight")
    plt.close(fig)
    return output_path


def create_data_quality_report(dataset, output_path: str, max_samples=None):
    """6-panel QC report PNG (ref: :202-291)."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        return None
    stats = analyze_dataset(dataset, max_samples=max_samples)
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))

    axes[0, 0].hist(stats["counts"], bins=20, color="tab:blue")
    axes[0, 0].set_title("Nuclei per image")
    axes[0, 1].hist(stats["coverages"], bins=20, color="tab:green")
    axes[0, 1].set_title("Mask coverage fraction")
    axes[0, 2].axis("off")
    lines = [
        f"samples: {stats['num_samples']}",
        f"nuclei/img: {stats['nuclei_per_image']['mean']:.1f} "
        f"± {stats['nuclei_per_image']['std']:.1f}",
        f"area(px): {stats['nucleus_area_px']['mean']:.1f} "
        f"± {stats['nucleus_area_px']['std']:.1f}",
        f"coverage: {stats['mask_coverage']['mean']:.3f}",
    ]
    axes[0, 2].text(0.05, 0.7, "\n".join(lines), fontsize=12, family="monospace")
    axes[0, 2].set_title("Summary")

    # sample overlays in the bottom row
    n_show = min(3, len(dataset))
    for c in range(3):
        ax = axes[1, c]
        if c < n_show:
            image, mask = dataset.load_raw(c)
            ax.imshow(image)
            ax.imshow(mask, alpha=0.4, cmap="Reds")
            ax.set_title(f"Sample {c}")
        ax.axis("off")
    fig.tight_layout()
    Path(output_path).parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(output_path, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return stats


def check_data_integrity(data_dir: str, splits=("train", "val")) -> dict:
    """Structure / pairing / readability checks (ref: :294-365)."""
    report: dict = {"data_dir": data_dir, "splits": {}, "ok": True}
    for split in splits:
        images_dir = os.path.join(data_dir, split, "images")
        annots_dir = os.path.join(data_dir, split, "annots")
        entry = {
            "images_dir_exists": os.path.isdir(images_dir),
            "annots_dir_exists": os.path.isdir(annots_dir),
            "num_images": 0,
            "num_annotations": 0,
            "unpaired_images": [],
            "unpaired_annotations": [],
            "unreadable": [],
        }
        if entry["images_dir_exists"] and entry["annots_dir_exists"]:
            imgs = {
                f.rsplit(".", 1)[0]
                for f in os.listdir(images_dir)
                if f.lower().endswith((".tif", ".tiff", ".png"))
            }
            annots = {
                f.rsplit(".", 1)[0]
                for f in os.listdir(annots_dir)
                if f.lower().endswith(".xml")
            }
            entry["num_images"] = len(imgs)
            entry["num_annotations"] = len(annots)
            entry["unpaired_images"] = sorted(imgs - annots)
            entry["unpaired_annotations"] = sorted(annots - imgs)
            if _HAVE_PIL:
                for stem in sorted(imgs & annots):
                    for ext in (".tif", ".tiff", ".png"):
                        p = os.path.join(images_dir, stem + ext)
                        if os.path.exists(p):
                            try:
                                with Image.open(p) as im:
                                    im.verify()
                            except Exception:
                                entry["unreadable"].append(stem + ext)
                            break
                    try:
                        parse_polygons(os.path.join(annots_dir, stem + ".xml"))
                    except Exception:
                        entry["unreadable"].append(stem + ".xml")
        if (
            not entry["images_dir_exists"]
            or entry["unpaired_images"]
            or entry["unreadable"]
        ):
            report["ok"] = False
        report["splits"][split] = entry
    return report

"""Herlev classification evaluation (ref: Herlev/test_herlev.py:46-605).

``HerlevEvaluator``: checkpoint loading (reads embedded config + stage,
ref: :74-102), single-image prediction with ImageNet normalization
(ref: :104-141), batched dataset evaluation (ref: :143-215), metric suite
(accuracy, per-class P/R/F1/support, macro/weighted averages, per-class
accuracy, ROC-AUC binary or macro-OvR; ref: :217-330) and the plot set
(confusion heatmap, per-class metric panels, sample-prediction grid with
green/red correctness coloring; ref: :397-605).

The metric implementations live in ``ugpg_tpu.metrics.classification`` —
numpy, sklearn-parity; no sklearn dependency needed (the reference carries
manual fallbacks for exactly this, ref: :19-37).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.data.augment import imagenet_normalize
from ugpg_tpu.data.herlev import CLASS_NAMES
from ugpg_tpu.io.checkpoint import load_checkpoint, sniff_stage
from ugpg_tpu.metrics.classification import (
    classification_report,
    confusion_matrix,
    macro_roc_auc_ovr,
    per_class_accuracy,
    roc_auc,
)
from ugpg_tpu.models.classifier import CLS_STAGE_RESOLUTIONS, HerlevClassificationModel
from ugpg_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["HerlevEvaluator"]

try:
    from PIL import Image

    _HAVE_PIL = True
except ImportError:  # pragma: no cover
    _HAVE_PIL = False


class HerlevEvaluator:
    def __init__(self, model_path: str, dtype=None):
        self.model_path = model_path
        self.stage = sniff_stage(model_path, default=4)
        _, _, meta = load_checkpoint(model_path)
        self.config = meta.get("config", {})
        self.num_classes = int(self.config.get("num_classes", 7))
        self.binary = bool(self.config.get("binary_classification", False))
        self.resolution = CLS_STAGE_RESOLUTIONS[self.stage]
        self.class_names = (
            ["normal", "abnormal"] if self.binary or self.num_classes == 2
            else list(CLASS_NAMES)
        )

        self.module = HerlevClassificationModel(
            stage=self.stage, num_classes=self.num_classes, dtype=dtype
        )
        template = self.module.init(
            jax.random.key(0),
            jnp.zeros((1, self.resolution, self.resolution, 3)),
            False,
        )
        self.variables, _, self.metadata = load_checkpoint(
            model_path, variables_template=template
        )
        print(f"Loaded stage-{self.stage} Herlev model ({self.num_classes} classes)")

        res = self.resolution

        @jax.jit
        def _forward(variables, images):
            x = resize_bilinear_align_corners(images, (res, res))
            x = imagenet_normalize(x)
            logits = self.module.apply(variables, x, False)
            return jax.nn.softmax(logits, axis=-1)

        self._forward = _forward

    # ------------------------------------------------------------------
    def predict_single(self, image_path: str):
        """(predicted class index, class name, probabilities)."""
        if not _HAVE_PIL:
            raise RuntimeError("PIL required")
        img = Image.open(image_path).convert("RGB").resize(
            (self.resolution, self.resolution), Image.BILINEAR
        )
        arr = np.asarray(img, np.float32)[None] / 255.0
        probs = np.asarray(self._forward(self.variables, jnp.asarray(arr)))[0]
        pred = int(np.argmax(probs))
        return pred, self.class_names[pred], probs

    def predict_probs(self, images: np.ndarray) -> np.ndarray:
        """Batched NHWC [0,1] -> softmax probabilities."""
        return np.asarray(self._forward(self.variables, jnp.asarray(images)))

    # ------------------------------------------------------------------
    def evaluate_dataset(self, dataset, batch_size: int = 16,
                         output_dir: str | None = None) -> dict:
        n = len(dataset)
        all_probs = []
        all_labels = []
        for start in range(0, n, batch_size):
            idxs = range(start, min(start + batch_size, n))
            imgs, labels = zip(*(dataset[i] for i in idxs))
            all_probs.append(self.predict_probs(np.stack(imgs)))
            all_labels.extend(labels)
        probs = np.concatenate(all_probs)
        y_true = np.asarray(all_labels)
        y_pred = probs.argmax(axis=1)

        report = classification_report(
            y_true, y_pred, self.num_classes, self.class_names
        )
        cm = confusion_matrix(y_true, y_pred, self.num_classes)
        pca = per_class_accuracy(y_true, y_pred, self.num_classes)
        if self.num_classes == 2:
            auc = roc_auc(y_true, probs[:, 1])
        else:
            auc = macro_roc_auc_ovr(y_true, probs)

        results = {
            "accuracy": report["accuracy"],
            "classification_report": report,
            "confusion_matrix": cm.tolist(),
            "per_class_accuracy": {
                self.class_names[i]: float(a) for i, a in enumerate(pca)
            },
            "roc_auc": auc,
            "num_samples": int(n),
            "stage": self.stage,
        }
        if output_dir:
            out = Path(output_dir)
            out.mkdir(parents=True, exist_ok=True)
            (out / "evaluation_results.json").write_text(
                json.dumps(results, indent=2)
            )
            self.plot_confusion_matrix(cm, out / "confusion_matrix.png")
            self.plot_class_metrics(report, out / "class_metrics.png")
        return results

    # ------------------------------------------------------------------
    def plot_confusion_matrix(self, cm: np.ndarray, path):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        fig, ax = plt.subplots(figsize=(8, 7))
        im = ax.imshow(cm, cmap="Blues")
        ax.set_xticks(range(len(self.class_names)))
        ax.set_yticks(range(len(self.class_names)))
        ax.set_xticklabels(self.class_names, rotation=45, ha="right")
        ax.set_yticklabels(self.class_names)
        for i in range(cm.shape[0]):
            for j in range(cm.shape[1]):
                ax.text(j, i, str(cm[i, j]), ha="center", va="center",
                        color="white" if cm[i, j] > cm.max() / 2 else "black")
        ax.set_xlabel("Predicted")
        ax.set_ylabel("True")
        ax.set_title("Confusion Matrix")
        fig.colorbar(im)
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_class_metrics(self, report: dict, path):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        names = [n for n in self.class_names if n in report]
        precision = [report[n]["precision"] for n in names]
        recall = [report[n]["recall"] for n in names]
        f1 = [report[n]["f1-score"] for n in names]
        support = [report[n]["support"] for n in names]
        x = np.arange(len(names))
        fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(15, 5))
        width = 0.27
        ax1.bar(x - width, precision, width, label="Precision")
        ax1.bar(x, recall, width, label="Recall")
        ax1.bar(x + width, f1, width, label="F1")
        ax1.set_xticks(x)
        ax1.set_xticklabels(names, rotation=45, ha="right")
        ax1.set_ylim(0, 1.05)
        ax1.legend()
        ax1.set_title("Per-class metrics")
        ax2.bar(x, support, color="tab:gray")
        ax2.set_xticks(x)
        ax2.set_xticklabels(names, rotation=45, ha="right")
        ax2.set_title("Class distribution (support)")
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_sample_predictions(self, dataset, path, num_samples: int = 16,
                                seed: int = 42):
        """Grid of sample predictions, green=correct / red=wrong
        (ref: test_herlev.py:521-605)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            return None
        rng = np.random.default_rng(seed)
        idxs = rng.choice(len(dataset), size=min(num_samples, len(dataset)),
                          replace=False)
        cols = 4
        rows = (len(idxs) + cols - 1) // cols
        fig, axes = plt.subplots(rows, cols, figsize=(3.2 * cols, 3.2 * rows))
        axes = np.atleast_2d(axes)
        for ax in axes.ravel():
            ax.axis("off")
        for ax, idx in zip(axes.ravel(), idxs):
            img, label = dataset[idx]
            probs = self.predict_probs(img[None])[0]
            pred = int(probs.argmax())
            ok = pred == label
            ax.imshow(img)
            ax.set_title(
                f"P: {self.class_names[pred]}\nT: {self.class_names[label]}",
                color="green" if ok else "red",
                fontsize=8,
            )
            ax.axis("off")
        fig.tight_layout()
        fig.savefig(path, dpi=110)
        plt.close(fig)
        return path

"""AugMoNuSegTrainer: segmentation trainer over the pre-augmented dataset.

Mirrors the reference subclass (ref: MoNuSegImprove/train_aug_monuseg.py:
36-123): builds per-stage AugMoNuSeg (train) + MoNuSeg (val) datasets at each
stage's resolution and auto-computes the BCE ``pos_weight = (1 - r) / r``
from the positive-pixel ratio of the full training set (ref: :94-121).

TPU-native differences: the pos-weight scan runs over the dataset's
rasterized masks in one vectorized numpy pass per sample (no tensor loop),
and pos_weight feeds the fused train step as a *dynamic* scalar — no loss
rebuild, no recompile.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
import numpy as np

from ugpg_tpu.data.loader import DataLoader
from ugpg_tpu.data.monuseg import AugMoNuSegDataset, MoNuSegDataset, create_train_val_split
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

__all__ = ["AugMoNuSegTrainer", "compute_pos_weight"]


def compute_pos_weight(dataset, max_samples: int | None = None) -> float:
    """pos_weight = (1-r)/r over the dataset's masks (ref: :94-121)."""
    pos = 0.0
    total = 0.0
    n = len(dataset) if max_samples is None else min(len(dataset), max_samples)
    for i in range(n):
        _, mask = dataset[i]
        pos += float(np.sum(mask))
        total += float(mask.size)
    ratio = pos / max(total, 1.0)
    if ratio <= 0.0:
        return 1.0
    return float((1.0 - ratio) / ratio)


class AugMoNuSegTrainer(UncertaintyGuidedProgressiveTrainer):
    """Progressive trainer wired to the augmented MoNuSeg data path."""

    def __init__(self, config: Mapping[str, Any] | None = None, **kwargs):
        config = dict(config or {})
        self.config = config
        kwargs.setdefault("uncertainty_alpha", config.get("uncertainty_alpha", 1.0))
        kwargs.setdefault("augment", True)  # on-device aug on the patch stream
        if "stage_configs" not in kwargs and "epochs_per_stage" in config:
            from ugpg_tpu.train.seg_trainer import DEFAULT_STAGE_CONFIGS

            kwargs["stage_configs"] = {
                s: {**cfg, "epochs_per_stage": config["epochs_per_stage"],
                    # config["lr"] is None unless the user overrode it
                    # (--lr); None must fall back to the stage default, not
                    # reach torch_rmsprop (an lr of None would not be
                    # injected as a mutable hyperparameter)
                    "lr": config.get("lr") or cfg["lr"]}
                for s, cfg in DEFAULT_STAGE_CONFIGS.items()
            }
        super().__init__(**kwargs)
        self.train_datasets: dict[int, Any] = {}
        self.val_datasets: dict[int, Any] = {}

    def setup_datasets(self, data_dir: str, stages=(1, 2, 3, 4)):
        """Per-stage AugMoNuSeg train + MoNuSeg val datasets
        (ref: train_aug_monuseg.py:56-92) and auto pos_weight (ref: :94-121)."""
        import os

        if not os.path.isdir(os.path.join(data_dir, "val")):
            print("No val/ split found; creating 80/20 split from train/")
            create_train_val_split(data_dir, val_ratio=0.2, seed=42)

        for stage in stages:
            res = self.stage_configs[stage]["resolution"]
            self.train_datasets[stage] = AugMoNuSegDataset(
                data_dir, image_size=res, split="train", augment=True
            )
            self.val_datasets[stage] = MoNuSegDataset(
                data_dir, image_size=res, split="val", augment=False
            )

        first = min(self.train_datasets)
        pw = compute_pos_weight(self.train_datasets[first])
        self.pos_weight = jnp.asarray(pw, jnp.float32)
        print(f"Auto-computed pos_weight: {pw:.4f}")
        return self.train_datasets, self.val_datasets

    def make_loaders(self, batch_size: int = 8, num_workers: int = 4):
        train_loaders = {
            s: DataLoader(ds, batch_size=batch_size, shuffle=True,
                          num_workers=num_workers, seed=42 + s)
            for s, ds in self.train_datasets.items()
        }
        val_loaders = {
            s: DataLoader(ds, batch_size=batch_size, num_workers=num_workers)
            for s, ds in self.val_datasets.items()
        }
        return train_loaders, val_loaders

"""Divergence guard: NaN/Inf epoch loss -> diagnostic checkpoint + error.

The reference trains straight through a NaN loss (no finiteness check
anywhere in its trainers); here the epoch-mean losses the trainers already
fetch are checked for free, the blown-up state is preserved in a
``*_diverged`` checkpoint, and training fails fast with a diagnosable
error (utils/anomaly.py).
"""

import json
import math

import numpy as np
import pytest

from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer
from ugpg_tpu.utils.anomaly import TrainingDivergedError, nonfinite_metrics

CFGS = {1: {"resolution": 16, "epochs_per_stage": 3, "lr": 3e-4}}


class _PoisonAtEpoch:
    """Loader wrapper that yields NaN images from epoch N on — models a
    corrupt shard / overflowed upstream producer appearing mid-run."""

    def __init__(self, inner, on_epoch: int):
        self.inner, self.on_epoch, self.epochs = inner, on_epoch, 0

    def __iter__(self):
        self.epochs += 1
        for images, labels in self.inner:
            if self.epochs >= self.on_epoch:
                images = np.full_like(images, np.nan)
            yield images, labels

    def __len__(self):
        return len(self.inner)


def test_nonfinite_metrics():
    assert nonfinite_metrics(a=1.0, b=-2.5) == {}
    bad = nonfinite_metrics(a=float("nan"), b=float("inf"), c=0.0)
    assert set(bad) == {"a", "b"}


def test_seg_guard_raises_and_saves_diagnostic(tmp_path):
    images, masks = disk_dataset(num_samples=8, image_size=16, seed=0)
    train = _PoisonAtEpoch(ArrayLoader(images, masks, batch_size=4), on_epoch=2)
    val = ArrayLoader(images[:4], masks[:4], batch_size=4)
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=CFGS, verbose=False)
    with pytest.raises(TrainingDivergedError) as ei:
        tr.train_progressive(train, val, max_stages=1, save_dir=tmp_path)
    err = ei.value
    assert err.stage == 1 and err.epoch == 2
    assert "train_loss" in err.metrics
    meta = json.loads(
        (tmp_path / "ug_pgunet_stage1_diverged" / "metadata.json").read_text()
    )
    assert meta["stage"] == 1 and "train_loss" in meta["diverged_metrics"]
    # the history at divergence is preserved: one clean epoch + the bad one
    assert len(meta["history"]["train_loss"]) == 2
    assert math.isnan(meta["history"]["train_loss"][-1])
    assert (tmp_path / "ug_pgunet_stage1_diverged" / "variables.msgpack").exists()


def test_seg_guard_opt_out_trains_through(tmp_path):
    images, masks = disk_dataset(num_samples=8, image_size=16, seed=0)
    train = _PoisonAtEpoch(ArrayLoader(images, masks, batch_size=4), on_epoch=2)
    val = ArrayLoader(images[:4], masks[:4], batch_size=4)
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=CFGS, verbose=False, nan_guard=False
    )
    hist = tr.train_progressive(train, val, max_stages=1, save_dir=tmp_path)
    assert len(hist["train_loss"]) == 3  # reference behavior: NaNs and all
    assert math.isnan(hist["train_loss"][-1])
    assert not (tmp_path / "ug_pgunet_stage1_diverged").exists()


def test_cls_guard_raises_and_saves_diagnostic(tmp_path):
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, size=8).astype(np.int64)
    imgs = rng.random((8, 32, 32, 3)).astype(np.float32)
    train = _PoisonAtEpoch(ArrayLoader(imgs, labels, batch_size=4), on_epoch=2)
    val = ArrayLoader(imgs[:4], labels[:4], batch_size=4)
    cfg = create_config()
    cfg.update(num_classes=3, epochs_per_stage=3, stages=[1],
               verbose=False, augment=False)
    tr = HerlevTrainer(cfg)
    with pytest.raises(TrainingDivergedError) as ei:
        tr.train_progressive(train, val, str(tmp_path))
    assert ei.value.stage == 1 and ei.value.epoch == 2
    meta = json.loads(
        (tmp_path / "herlev_stage1_diverged" / "metadata.json").read_text()
    )
    assert "train_loss" in meta["diverged_metrics"]

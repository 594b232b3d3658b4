"""Integration: progressive trainer end-to-end on synthetic data
(BASELINE.json config 4, shrunk for CPU)."""

import json

import numpy as np
import pytest

from ugpg_tpu.data.synthetic import ArrayLoader, DummyDataset, disk_dataset
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

# quarter-resolution pyramid: the trainer machinery under test (stage loop,
# transfer, uncertainty stats, checkpoints, plots) is resolution-independent;
# full stage resolutions are exercised by bench/profile runs and eval tests
SMALL_CONFIGS = {
    1: {"resolution": 16, "epochs_per_stage": 2, "lr": 3e-4},
    2: {"resolution": 32, "epochs_per_stage": 1, "lr": 1e-4},
    3: {"resolution": 64, "epochs_per_stage": 1, "lr": 1e-4},
    4: {"resolution": 128, "epochs_per_stage": 1, "lr": 1e-4},
}


@pytest.fixture(scope="module")
def loaders():
    images, masks = disk_dataset(num_samples=16, image_size=32, seed=1)
    train = ArrayLoader(images[:12], masks[:12], batch_size=4, shuffle=True)
    val = ArrayLoader(images[12:], masks[12:], batch_size=4)
    return train, val


def test_progressive_two_stages(tmp_path, loaders):
    train, val = loaders
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=SMALL_CONFIGS, verbose=False
    )
    history = tr.train_progressive(train, val, max_stages=2, save_dir=tmp_path)

    assert len(history["train_loss"]) == 3  # 2 + 1 epochs
    assert history["stage_transitions"] == [0, 2]
    # stage-2 epochs carry uncertainty stats > 0
    assert history["uncertainty_weights_mean"][-1] > 0.0
    # best checkpoints written with reference naming + metadata schema
    for stage in (1, 2):
        ckpt = tmp_path / f"ug_pgunet_stage{stage}_best"
        assert (ckpt / "variables.msgpack").exists()
        meta = json.loads((ckpt / "metadata.json").read_text())
        assert meta["stage"] == stage
        assert "val_dice" in meta and "uncertainty_alpha" in meta
    # training plot emitted
    assert (tmp_path / "uncertainty_guided_training_plots.png").exists()


def test_stage1_actually_learns(loaders):
    train, val = loaders
    cfgs = {1: {"resolution": 32, "epochs_per_stage": 3, "lr": 3e-4}}
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    tr.train_progressive(train, val, max_stages=1, save_dir="/tmp/ugpg_t1")
    h = tr.history
    assert h["train_dice"][-1] > h["train_dice"][0]
    assert h["train_loss"][-1] < h["train_loss"][0]


def test_checkpoint_roundtrip(tmp_path, loaders):
    train, val = loaders
    cfgs = {1: {"resolution": 16, "epochs_per_stage": 1, "lr": 3e-4}}
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    tr.train_progressive(train, val, max_stages=1, save_dir=tmp_path)

    tr2 = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    tr2.load_stage_weights(1, tmp_path / "ug_pgunet_stage1_best")
    a = tr.variables[1]["params"]["inc"]["conv"]["conv1"]["kernel"]
    b = tr2.variables[1]["params"]["inc"]["conv"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # loaded model validates identically
    va = tr2.validate_epoch(val, 1)
    assert np.isfinite(va[0])


def test_uncertainty_analysis_json(tmp_path, loaders):
    train, val = loaders
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=SMALL_CONFIGS, verbose=False
    )
    tr._ensure_variables(1)
    tr._ensure_variables(2)
    stats = tr.save_uncertainty_analysis(val, 2, tmp_path)
    assert stats and all(0 <= s["uncertainty_mean"] <= 1 for s in stats)
    data = json.loads((tmp_path / "uncertainty_stats_stage2.json").read_text())
    assert data == stats
    assert tr.save_uncertainty_analysis(val, 1, tmp_path) is None


def test_dummy_dataset_fixture():
    ds = DummyDataset(num_samples=5, image_size=32)
    img, mask = ds[0]
    assert img.shape == (32, 32, 3) and mask.shape == (32, 32, 1)
    assert len(ds) == 5
    assert set(np.unique(mask)).issubset({0.0, 1.0})

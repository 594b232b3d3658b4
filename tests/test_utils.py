"""Config dataclasses, profiling utils, CSV training log."""

import csv
import json
import time
from pathlib import Path

import numpy as np
import pytest

from ugpg_tpu.utils.config import (
    HerlevTrainConfig,
    SegTrainConfig,
    apply_overrides,
    load_config,
    save_config,
)
from ugpg_tpu.utils.profiling import CSVLogger, StepTimer, annotate


def test_seg_config_defaults_match_reference():
    cfg = SegTrainConfig()
    sc = cfg.stage_configs()
    assert sc[1]["lr"] == 3e-4 and sc[2]["lr"] == 1e-4
    assert sc[4]["resolution"] == 256
    assert cfg.batch_size == 8 and cfg.weight_decay == 1e-4


def test_herlev_config_binary_num_classes():
    cfg = HerlevTrainConfig(binary_classification=True)
    assert cfg.as_trainer_config()["num_classes"] == 2
    assert HerlevTrainConfig().as_trainer_config()["num_classes"] == 7


def test_config_roundtrip(tmp_path):
    cfg = SegTrainConfig(stages=[1, 2], epochs_per_stage=3, bf16=True)
    p = save_config(cfg, tmp_path / "cfg.json")
    back = load_config(p)
    assert back == cfg
    hcfg = HerlevTrainConfig(pretrained_unet_paths={2: "/x"}, data_dir="/d")
    back2 = load_config(save_config(hcfg, tmp_path / "h.json"))
    assert back2.pretrained_unet_paths == {2: "/x"}


def test_apply_overrides():
    cfg = SegTrainConfig()
    out = apply_overrides(cfg, batch_size=16, data_dir=None)
    assert out.batch_size == 16 and out.data_dir == cfg.data_dir


def test_step_timer():
    t = StepTimer()
    for _ in range(5):
        with t:
            time.sleep(0.002)
    s = t.summary()
    assert s["steps"] == 5 and s["mean_s"] >= 0.002
    assert t.ema is not None


def test_annotate_noop():
    with annotate("region"):
        pass


def test_csv_logger(tmp_path):
    log = CSVLogger(tmp_path / "log.csv", ["a", "b"])
    log.log(a=1, b=2)
    log.log(a=3)  # missing field -> empty
    rows = list(csv.DictReader(open(tmp_path / "log.csv")))
    assert rows[0] == {"a": "1", "b": "2"}
    assert rows[1]["b"] == ""
    # append-safe: reopening keeps existing rows
    log2 = CSVLogger(tmp_path / "log.csv", ["a", "b"])
    log2.log(a=5, b=6)
    assert len(list(csv.DictReader(open(tmp_path / "log.csv")))) == 3


def test_trainer_writes_training_log(tmp_path):
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    images, masks = disk_dataset(num_samples=8, image_size=32, seed=5)
    loader = ArrayLoader(images, masks, batch_size=4)
    cfgs = {1: {"resolution": 16, "epochs_per_stage": 2, "lr": 3e-4}}
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    tr.train_progressive(loader, loader, max_stages=1, save_dir=tmp_path)
    rows = list(csv.DictReader(open(tmp_path / "training_log.csv")))
    assert len(rows) == 2
    assert rows[0]["stage"] == "1" and float(rows[0]["lr"]) == pytest.approx(3e-4)
    assert float(rows[1]["train_dice"]) > 0


def test_trainer_writes_tensorboard_events(tmp_path):
    """tb_logdir= wires real TensorBoard event files (the reference pins
    tensorboard in requirements but never imports it — SURVEY §5)."""
    pytest.importorskip("torch.utils.tensorboard")
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    images, masks = disk_dataset(num_samples=4, image_size=16, seed=6)
    loader = ArrayLoader(images, masks, batch_size=4)
    cfgs = {1: {"resolution": 16, "epochs_per_stage": 2, "lr": 3e-4}}
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, tb_logdir=tmp_path / "tb"
    )
    tr.train_progressive(loader, loader, max_stages=1, save_dir=tmp_path)
    events = list((tmp_path / "tb").glob("events.out.tfevents.*"))
    assert events and events[0].stat().st_size > 0


def test_tbwriter_noop_without_backend(monkeypatch, tmp_path):
    """Missing backend -> one warning, no crash, inert writer."""
    import builtins

    real_import = builtins.__import__

    def no_tb(name, *a, **k):
        if name.startswith("torch"):
            raise ImportError("no torch here")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_tb)
    from ugpg_tpu.utils.tb import TBWriter

    with pytest.warns(UserWarning, match="disabled"):
        w = TBWriter(tmp_path)
    assert not w.active
    w.scalars(0, loss=1.0)  # no-op, no crash
    w.close()


def test_prefetch_propagates_producer_errors():
    """An exception in the prefetch put/transfer must surface in the
    consumer, not silently truncate the epoch."""
    import pytest

    from ugpg_tpu.data.loader import prefetch_to_device

    def bad_put(batch):
        if batch == 2:
            raise RuntimeError("shard failed")
        return batch

    got = []
    with pytest.raises(RuntimeError, match="shard failed"):
        for item in prefetch_to_device(iter([0, 1, 2, 3]), put=bad_put):
            got.append(item)
    assert got == [0, 1]

"""Preemption-safe training: SIGTERM -> rolling checkpoint -> resume.

The reference loses everything since the last best-checkpoint on eviction
(its only handler prints and exits, ref: train_aug_monuseg.py:263-267).
Here a PreemptionGuard turns the scheduler's SIGTERM into a cooperative
epoch-boundary stop with a resumable ``_last`` checkpoint.
"""

import json
import os
import signal

import numpy as np
import pytest

from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer
from ugpg_tpu.utils.preemption import PreemptionGuard

CFGS = {
    1: {"resolution": 16, "epochs_per_stage": 3, "lr": 3e-4},
    2: {"resolution": 32, "epochs_per_stage": 3, "lr": 1e-4},
}


@pytest.fixture
def loaders():
    images, masks = disk_dataset(num_samples=12, image_size=32, seed=3)
    return (
        ArrayLoader(images[:8], masks[:8], batch_size=4),
        ArrayLoader(images[8:], masks[8:], batch_size=4),
    )


class _KillDuringEpoch:
    """Loader wrapper that delivers a real SIGTERM to this process when
    iteration N starts — models eviction arriving mid-epoch."""

    def __init__(self, inner, on_epoch: int, action):
        self.inner, self.on_epoch, self.action = inner, on_epoch, action
        self.epochs = 0

    def __iter__(self):
        self.epochs += 1
        if self.epochs == self.on_epoch:
            self.action()
        return iter(self.inner)

    def __len__(self):
        return len(self.inner)


def test_guard_signal_sets_flag_and_restores_handler():
    before = signal.getsignal(signal.SIGTERM)
    with PreemptionGuard() as g:
        assert not g.should_stop()
        os.kill(os.getpid(), signal.SIGTERM)  # delivered synchronously
        assert g.should_stop()
        assert g.signum == signal.SIGTERM and g.at is not None
    assert signal.getsignal(signal.SIGTERM) is before


def test_guard_second_signal_falls_through_to_previous_handler():
    hits = []
    prev = signal.signal(signal.SIGTERM, lambda s, f: hits.append(s))
    try:
        with PreemptionGuard() as g:
            os.kill(os.getpid(), signal.SIGTERM)
            assert g.should_stop() and not hits
            os.kill(os.getpid(), signal.SIGTERM)  # determined kill
            assert hits == [signal.SIGTERM]
    finally:
        signal.signal(signal.SIGTERM, prev)


def test_guard_install_is_idempotent():
    with PreemptionGuard() as g:
        inner = signal.getsignal(signal.SIGTERM)
        g.install()  # second install must not capture its own handler
        assert signal.getsignal(signal.SIGTERM) is inner
    # and uninstall after double-install still restores the original
    assert signal.getsignal(signal.SIGTERM) is not inner


def test_seg_preempt_saves_last_and_resume_completes(tmp_path, loaders):
    train, val = loaders
    guard = PreemptionGuard().install()
    try:
        killer = _KillDuringEpoch(
            train, on_epoch=2,
            action=lambda: os.kill(os.getpid(), signal.SIGTERM),
        )
        t1 = UncertaintyGuidedProgressiveTrainer(
            stage_configs=CFGS, verbose=False
        )
        hist = t1.train_progressive(
            killer, val, max_stages=2, save_dir=tmp_path, preemption=guard
        )
    finally:
        guard.uninstall()

    # stopped at the end of stage-1 epoch 2 (of 3), stage 2 never entered
    assert t1.preempted
    assert len(hist["train_loss"]) == 2
    last = tmp_path / "ug_pgunet_stage1_last"
    meta = json.loads((last / "metadata.json").read_text())
    assert meta["stage"] == 1 and meta["epoch"] == 1
    assert (last / "variables.msgpack").exists()
    assert (last / "opt_state.msgpack").exists()
    assert not (tmp_path / "ug_pgunet_stage2_last").exists()

    # requeue: resume finishes stage 1 and runs all of stage 2
    t2 = UncertaintyGuidedProgressiveTrainer(stage_configs=CFGS, verbose=False)
    hist2 = t2.train_progressive(
        train, val, max_stages=2, save_dir=tmp_path,
        checkpoint_every=1, resume=True,
    )
    assert not t2.preempted
    # restored 2 epochs + 1 remaining stage-1 + 3 stage-2
    assert len(hist2["train_loss"]) == 6
    meta2 = json.loads(
        (tmp_path / "ug_pgunet_stage2_last" / "metadata.json").read_text()
    )
    assert meta2["epoch"] == 2


def test_seg_without_guard_ignores_stray_state(tmp_path, loaders):
    """No guard passed: training runs to completion (the default path)."""
    train, val = loaders
    cfgs = {1: dict(CFGS[1])}
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    hist = tr.train_progressive(train, val, max_stages=1, save_dir=tmp_path)
    assert len(hist["train_loss"]) == 3
    assert not tr.preempted


def test_cls_preempt_saves_last(tmp_path):
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    rng = np.random.default_rng(0)
    labels = rng.integers(0, 3, size=16)
    imgs = rng.random((16, 32, 32, 3)).astype(np.float32)
    train = ArrayLoader(imgs[:12], labels[:12].astype(np.int64), batch_size=4)
    val = ArrayLoader(imgs[12:], labels[12:].astype(np.int64), batch_size=4)

    cfg = create_config()
    cfg.update(num_classes=3, epochs_per_stage=3, stages=[1],
               verbose=False, augment=False)
    tr = HerlevTrainer(cfg)
    guard = PreemptionGuard()
    guard.trigger()  # armed before epoch 1 ends -> stop after epoch 1
    tr.train_progressive(train, val, str(tmp_path), preemption=guard)
    assert tr.preempted
    last = tmp_path / "herlev_stage1_last"
    meta = json.loads((last / "metadata.json").read_text())
    assert meta["stage"] == 1 and meta["epoch"] == 1
    assert (last / "variables.msgpack").exists()


def test_cls_preempt_resume_completes(tmp_path):
    """Requeue round trip: preempt mid-stage-1 -> --resume continues at the
    right epoch with restored optimizer/scheduler/early-stop state, then
    finishes stage 2 (the monuseg CLI contract, now on the cls side too)."""
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    rng = np.random.default_rng(1)
    labels = rng.integers(0, 3, size=16)
    imgs = rng.random((16, 32, 32, 3)).astype(np.float32)
    train = ArrayLoader(imgs[:12], labels[:12].astype(np.int64), batch_size=4)
    val = ArrayLoader(imgs[12:], labels[12:].astype(np.int64), batch_size=4)

    cfg = create_config()
    cfg.update(num_classes=3, epochs_per_stage=3, stages=[1, 2],
               verbose=False, augment=False)

    guard = PreemptionGuard().install()
    try:
        killer = _KillDuringEpoch(
            train, on_epoch=2,
            action=lambda: os.kill(os.getpid(), signal.SIGTERM),
        )
        t1 = HerlevTrainer(cfg)
        hist = t1.train_progressive(
            killer, val, str(tmp_path), preemption=guard
        )
    finally:
        guard.uninstall()

    assert t1.preempted
    assert len(hist["train_loss"]) == 2  # stopped after stage-1 epoch 2
    meta = json.loads(
        (tmp_path / "herlev_stage1_last" / "metadata.json").read_text()
    )
    assert meta["stage"] == 1 and meta["epoch"] == 2
    assert "epochs_without_improvement" in meta and "scheduler" in meta
    assert not (tmp_path / "herlev_stage2_last").exists()

    # requeue: resume finishes stage-1 epoch 3, then all 3 stage-2 epochs
    t2 = HerlevTrainer(cfg)
    hist2 = t2.train_progressive(
        train, val, str(tmp_path), resume=True
    )
    assert not t2.preempted
    assert len(hist2["train_loss"]) == 6  # 2 restored + 1 + 3
    # both stages recorded their transitions exactly once
    assert [t["stage"] for t in hist2["stage_transitions"]] == [1, 2]


def test_cls_preemption_wins_over_early_stop(tmp_path):
    """A pending SIGTERM is acknowledged even when early stopping fires the
    same epoch: the resumable checkpoint is written and the stage loop stops
    as preempted (not as a normal early stop that would enter stage 2)."""
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    rng = np.random.default_rng(2)
    labels = rng.integers(0, 3, size=8)
    imgs = rng.random((8, 32, 32, 3)).astype(np.float32)
    train = ArrayLoader(imgs, labels.astype(np.int64), batch_size=4)

    cfg = create_config()
    cfg.update(num_classes=3, epochs_per_stage=2, stages=[1, 2],
               early_stopping_patience=0, verbose=False, augment=False)
    tr = HerlevTrainer(cfg)
    guard = PreemptionGuard()
    guard.trigger()
    tr.train_progressive(train, train, str(tmp_path), preemption=guard)
    assert tr.preempted
    assert (tmp_path / "herlev_stage1_last" / "metadata.json").exists()
    assert not (tmp_path / "herlev_stage2_last").exists()


def test_cli_exit_code_translates_preemption(monkeypatch):
    """The packaged console scripts go through cli(), which maps a preempted
    trainer to exit 75 (EX_TEMPFAIL) — sys.exit(main()) on the trainer
    object would exit 1 on success."""
    from ugpg_tpu.cli import train_herlev, train_monuseg

    class _T:
        def __init__(self, preempted):
            self.preempted = preempted

    for mod in (train_monuseg, train_herlev):
        monkeypatch.setattr(mod, "main", lambda argv=None: _T(True))
        assert mod.cli([]) == 75
        monkeypatch.setattr(mod, "main", lambda argv=None: _T(False))
        assert mod.cli([]) == 0

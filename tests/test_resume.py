"""Elastic recovery: periodic _last checkpoints + mid-stage resume."""

import json

import numpy as np
import pytest

from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

# quarter-resolution stages: the resume/rolling-checkpoint machinery under
# test is resolution-independent (real stage resolutions are covered by the
# trainer integration tests)
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


def test_checkpoint_every_writes_last(tmp_path, loaders):
    train, val = loaders
    tr = UncertaintyGuidedProgressiveTrainer(stage_configs=CFGS, verbose=False)
    tr.train_progressive(
        train, val, max_stages=1, save_dir=tmp_path, checkpoint_every=1
    )
    last = tmp_path / "ug_pgunet_stage1_last"
    assert (last / "variables.msgpack").exists()
    assert (last / "opt_state.msgpack").exists()
    meta = json.loads((last / "metadata.json").read_text())
    assert meta["epoch"] == 2  # final epoch index


def test_mid_stage_resume_continues(tmp_path, loaders):
    train, val = loaders
    # run stage 1 fully + stage 2 partially (simulate interruption after
    # stage-2 epoch 1 by training stage 2 with epochs_per_stage=1)
    part_cfgs = {1: dict(CFGS[1]), 2: {**CFGS[2], "epochs_per_stage": 1}}
    t1 = UncertaintyGuidedProgressiveTrainer(stage_configs=part_cfgs, verbose=False)
    t1.train_progressive(
        train, val, max_stages=2, save_dir=tmp_path, checkpoint_every=1
    )
    assert (tmp_path / "ug_pgunet_stage2_last" / "metadata.json").exists()

    # fresh trainer resumes: must skip stage 1, restore stage-2 epoch 0,
    # and run the remaining 2 stage-2 epochs
    t2 = UncertaintyGuidedProgressiveTrainer(stage_configs=CFGS, verbose=False)
    hist = t2.train_progressive(
        train, val, max_stages=2, save_dir=tmp_path, checkpoint_every=1,
        resume=True,
    )
    meta = json.loads(
        (tmp_path / "ug_pgunet_stage2_last" / "metadata.json").read_text()
    )
    assert meta["epoch"] == 2  # continued to the final epoch
    # history restored + extended: 3 (stage1) + 1 (partial stage2) + 2 more
    assert len(hist["train_loss"]) == 6
    # stage-1 weights were restored for the uncertainty source
    assert 1 in t2.variables


def test_resume_does_not_overwrite_better_best(tmp_path, loaders):
    """best_val_dice is seeded from the _best checkpoint on resume: a worse
    post-resume epoch must NOT overwrite better saved weights."""
    import shutil

    train, val = loaders
    cfgs = {1: {**CFGS[1], "epochs_per_stage": 2}}
    t1 = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    t1.train_progressive(
        train, val, max_stages=1, save_dir=tmp_path, checkpoint_every=1
    )
    best = tmp_path / "ug_pgunet_stage1_best"
    # make the saved best unbeatable, and rewind _last to epoch 0 so the
    # resumed run re-trains epochs 1..2
    for d in (best, tmp_path / "ug_pgunet_stage1_last"):
        meta = json.loads((d / "metadata.json").read_text())
        if d is best:
            meta["val_dice"] = 0.99
        else:
            meta["epoch"] = 0
        (d / "metadata.json").write_text(json.dumps(meta))
    fingerprint = (best / "variables.msgpack").read_bytes()

    cfgs3 = {1: {**CFGS[1], "epochs_per_stage": 3}}
    t2 = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs3, verbose=False)
    t2.train_progressive(
        train, val, max_stages=1, save_dir=tmp_path,
        checkpoint_every=1, resume=True,
    )
    # real epochs can't reach dice 0.99 here: the best weights must be intact
    assert (best / "variables.msgpack").read_bytes() == fingerprint
    assert json.loads((best / "metadata.json").read_text())["val_dice"] == 0.99


def test_resume_with_stage_gap_loads_resume_stage_weights(tmp_path, loaders):
    """resume=True with a stages list PAST the resume stage must load that
    stage's trained weights before transferring — not transfer from a
    freshly-initialized tree (and use random weights as the uncertainty
    source)."""
    train, val = loaders
    part = {1: {**CFGS[1], "epochs_per_stage": 1},
            2: {**CFGS[2], "epochs_per_stage": 1}}
    t1 = UncertaintyGuidedProgressiveTrainer(stage_configs=part, verbose=False)
    t1.train_progressive(
        train, val, max_stages=2, save_dir=tmp_path, checkpoint_every=1
    )

    from ugpg_tpu.io.checkpoint import load_checkpoint

    cfgs = dict(part)
    cfgs[3] = {"resolution": 64, "epochs_per_stage": 1, "lr": 1e-4}
    t2 = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    t2.train_progressive(
        train, val, stages=[3], save_dir=tmp_path,
        checkpoint_every=1, resume=True,
    )
    saved, _, _ = load_checkpoint(
        tmp_path / "ug_pgunet_stage2_last",
        variables_template=t2._ensure_variables(2),
    )
    a = np.asarray(saved["params"]["inc"]["conv"]["conv1"]["kernel"])
    b = np.asarray(t2.variables[2]["params"]["inc"]["conv"]["conv1"]["kernel"])
    np.testing.assert_array_equal(a, b)


def test_resume_with_nothing_to_resume(tmp_path, loaders):
    train, val = loaders
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs={1: {**CFGS[1], "epochs_per_stage": 1}}, verbose=False
    )
    hist = tr.train_progressive(
        train, val, max_stages=1, save_dir=tmp_path, resume=True
    )
    assert len(hist["train_loss"]) == 1  # trained normally

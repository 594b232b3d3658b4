"""HerlevTrainer integration tests (BASELINE.json config 3, shrunk for CPU)."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.data.synthetic import ArrayLoader
from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config
from ugpg_tpu.train.optim import get_learning_rate


def _cls_data(rng, n=32, size=32, k=3):
    """Learnable task: class = dominant color channel."""
    labels = rng.integers(0, k, size=n)
    imgs = rng.random((n, size, size, 3)).astype(np.float32) * 0.3
    for i, lab in enumerate(labels):
        imgs[i, :, :, lab % 3] += 0.6
    return imgs.clip(0, 1), labels.astype(np.int64)


@pytest.fixture
def config():
    cfg = create_config()
    cfg.update(
        num_classes=3,
        epochs_per_stage=3,
        stages=[1, 2],
        early_stopping_patience=10,
        verbose=False,
        augment=False,  # deterministic for the learning assertion
    )
    return cfg


@pytest.mark.slow
def test_train_progressive_two_stages(tmp_path, config, rng):
    imgs, labels = _cls_data(rng, n=32, size=32)
    train = ArrayLoader(imgs[:24], labels[:24], batch_size=8, shuffle=True)
    val = ArrayLoader(imgs[24:], labels[24:], batch_size=8)
    tr = HerlevTrainer(config)
    hist = tr.train_progressive(train, val, str(tmp_path))

    assert len(hist["train_acc"]) == 6  # 3 epochs x 2 stages
    # stage 1 learns the color task
    assert hist["train_acc"][2] > hist["train_acc"][0] or hist["train_acc"][2] > 60
    # stage 2 carries uncertainty stats (weights in [1, 2])
    assert 1.0 <= hist["uncertainty_weights_mean"][-1] <= 2.0 + 1e-6
    # checkpoints + history JSON
    for stage in (1, 2):
        meta = json.loads(
            (tmp_path / f"herlev_stage{stage}_best" / "metadata.json").read_text()
        )
        assert meta["stage"] == stage and "config" in meta
    assert (tmp_path / "training_history.json").exists()


def test_classifier_head_transfer(config, rng):
    tr = HerlevTrainer(config)
    v1 = tr._ensure_variables(1)
    tr.variables[1] = jax.tree.map(lambda x: x + 1.0, v1)  # make distinctive
    tr._ensure_variables(2)
    tr.transfer_weights(1, 2)
    # head fc1..fc3 copied exactly (same shapes across stages)
    for key in ("fc1", "fc2", "fc3"):
        np.testing.assert_array_equal(
            np.asarray(tr.variables[1]["params"][key]["kernel"]),
            np.asarray(tr.variables[2]["params"][key]["kernel"]),
        )
    # encoder NOT transferred
    assert not np.allclose(
        np.asarray(tr.variables[1]["params"]["unet"]["inc"]["conv"]["conv1"]["bias"]).mean(),
        np.asarray(tr.variables[2]["params"]["unet"]["inc"]["conv"]["conv1"]["bias"]).mean(),
    )


def test_class_weights_flow_into_loss(config, rng):
    imgs, labels = _cls_data(rng, n=16, size=32)
    loader = ArrayLoader(imgs, labels, batch_size=8)
    cfg_w = dict(config)
    cfg_w["class_weights"] = [10.0, 1.0, 1.0]
    t_w = HerlevTrainer(cfg_w)
    t_p = HerlevTrainer(config)
    lw = t_w.validate_epoch(loader, 1)[0]
    lp = t_p.validate_epoch(loader, 1)[0]
    assert lw != lp


def test_plateau_reduces_lr(config, rng):
    imgs, labels = _cls_data(rng, n=16, size=32)
    loader = ArrayLoader(imgs, labels, batch_size=16)
    tr = HerlevTrainer(config)
    tr.setup_optimizer_scheduler(1)
    lr0 = get_learning_rate(tr._state.opt_state)
    # feed 7 non-improving epochs through the scheduler
    state = tr._state.opt_state
    tr._scheduler.step(1.0, state)
    for _ in range(6):
        state = tr._scheduler.step(1.0, state)
    assert get_learning_rate(state) == pytest.approx(lr0 * 0.5)


def test_pretrained_unet_load_and_freeze(tmp_path, config, rng):
    """Segmentation checkpoint merges into the encoder; encoder is frozen."""
    import jax.numpy as jnp

    from ugpg_tpu.io.checkpoint import save_checkpoint
    from ugpg_tpu.models.pgunet import PGUNet1

    seg = PGUNet1(num_classes=1)
    seg_vars = seg.init(jax.random.key(7), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = save_checkpoint(tmp_path / "seg1", seg_vars, metadata={"stage": 1})

    tr = HerlevTrainer(config)
    tr.load_pretrained_unet(1, str(ckpt))
    np.testing.assert_array_equal(
        np.asarray(seg_vars["params"]["inc"]["conv"]["conv1"]["kernel"]),
        np.asarray(tr.variables[1]["params"]["unet"]["inc"]["conv"]["conv1"]["kernel"]),
    )
    # frozen: one train epoch must not change encoder params
    imgs, labels = _cls_data(rng, n=8, size=32)
    loader = ArrayLoader(imgs, labels, batch_size=8)
    tr.setup_optimizer_scheduler(1)
    before = np.asarray(tr.variables[1]["params"]["unet"]["inc"]["conv"]["conv1"]["kernel"]).copy()
    tr.train_epoch(loader, 1)
    after = np.asarray(tr.variables[1]["params"]["unet"]["inc"]["conv"]["conv1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    # but the head DID update
    # (fc3 kernel must have moved)
    # re-run one more epoch and compare fc3
    fc3_before = np.asarray(tr.variables[1]["params"]["fc3"]["kernel"]).copy()
    tr.train_epoch(loader, 1)
    fc3_after = np.asarray(tr.variables[1]["params"]["fc3"]["kernel"])
    assert not np.allclose(fc3_before, fc3_after)

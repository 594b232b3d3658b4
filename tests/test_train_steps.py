"""Fused train/eval step tests (BASELINE.json config 1: stage-1 32x32
binary segmentation fwd/bwd, CPU-runnable)."""

import numpy as np

import jax
import jax.numpy as jnp

from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
from ugpg_tpu.train.optim import torch_rmsprop
from ugpg_tpu.train.steps import (
    TrainState,
    make_seg_eval_step,
    make_seg_train_step,
)

POS_W = jnp.asarray(5.0)


def _state(module, res, tx, seed=0):
    v = module.init(jax.random.key(seed), jnp.zeros((1, res, res, 3)), False)
    return TrainState.create(v, tx)


def test_stage1_train_step_learns():
    images, masks = disk_dataset(num_samples=8, image_size=32)
    tx = torch_rmsprop(3e-4, weight_decay=1e-4)
    module = PGUNet1(num_classes=1)
    state = _state(module, 32, tx)
    step = make_seg_train_step(module, tx, 1, 32, donate=False)

    batch = (jnp.asarray(images), jnp.asarray(masks))
    losses, dices = [], []
    for _ in range(8):
        state, m = step(state, {}, batch, POS_W, jax.random.key(0))
        losses.append(float(m["final_loss"]))
        dices.append(float(m["dice"]))
    assert losses[-1] < losses[0] * 0.7
    assert dices[-1] > dices[0]
    assert int(state.step) == 8
    # stage 1: no uncertainty stats
    assert float(m["uncertainty_weight_mean"]) == 0.0


def test_stage1_resizes_input_in_graph():
    """Batch at 64px must be resized to 32px inside the step."""
    tx = torch_rmsprop(3e-4)
    module = PGUNet1(num_classes=1)
    state = _state(module, 32, tx)
    step = make_seg_train_step(module, tx, 1, 32, donate=False)
    x = jnp.zeros((2, 64, 64, 3))
    y = jnp.zeros((2, 64, 64, 1))
    state, m = step(state, {}, (x, y), POS_W, jax.random.key(0))
    assert np.isfinite(float(m["final_loss"]))


def test_stage2_uncertainty_step():
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    m1 = PGUNet1(num_classes=1)
    m2 = PGUNet2(num_classes=1)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    state = _state(m2, 64, tx, seed=1)
    step = make_seg_train_step(
        m2, tx, 2, 64, prev_module=m1, prev_resolution=32, alpha=1.0, donate=False
    )
    images, masks = disk_dataset(num_samples=8, image_size=64, seed=3)
    state, metrics = step(state, v1, (jnp.asarray(images), jnp.asarray(masks)), POS_W, jax.random.key(0))
    # weighted loss must exceed base loss (weights = 1 + alpha*A >= 1)
    assert float(metrics["final_loss"]) >= float(metrics["base_loss"])
    # untrained prev model -> probs near 0.5 -> uncertainty near 1
    assert 0.5 < float(metrics["uncertainty_weight_mean"]) <= 1.0 + 1e-6
    assert np.isfinite(float(metrics["dice"]))


def test_eval_step_no_mutation():
    tx = torch_rmsprop(3e-4)
    module = PGUNet1(num_classes=1)
    state = _state(module, 32, tx)
    eval_step = make_seg_eval_step(module, 1, 32)
    images, masks = disk_dataset(num_samples=4, image_size=32, seed=5)
    batch = (jnp.asarray(images), jnp.asarray(masks))
    m1 = eval_step(state.variables, {}, batch, POS_W)
    m2 = eval_step(state.variables, {}, batch, POS_W)
    assert float(m1["final_loss"]) == float(m2["final_loss"])


def test_dynamic_pos_weight_no_recompile():
    tx = torch_rmsprop(3e-4)
    module = PGUNet1(num_classes=1)
    state = _state(module, 32, tx)
    step = make_seg_train_step(module, tx, 1, 32, donate=False)
    images, masks = disk_dataset(num_samples=4, image_size=32)
    batch = (jnp.asarray(images), jnp.asarray(masks))
    _, ma = step(state, {}, batch, jnp.asarray(1.0), jax.random.key(0))
    _, mb = step(state, {}, batch, jnp.asarray(10.0), jax.random.key(0))
    # higher pos_weight -> higher loss on positive-heavy error
    assert float(mb["final_loss"]) != float(ma["final_loss"])


def test_train_step_with_on_device_augment():
    tx = torch_rmsprop(3e-4)
    module = PGUNet1(num_classes=1)
    state = _state(module, 32, tx)
    step = make_seg_train_step(module, tx, 1, 32, donate=False, augment=True)
    images, masks = disk_dataset(num_samples=4, image_size=32, seed=9)
    batch = (jnp.asarray(images), jnp.asarray(masks))
    s1, m1 = step(state, {}, batch, POS_W, jax.random.key(1))
    s2, m2 = step(state, {}, batch, POS_W, jax.random.key(2))
    # different augmentation keys -> different losses
    assert float(m1["final_loss"]) != float(m2["final_loss"])

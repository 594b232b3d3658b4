"""Gradient accumulation: K micro-batches, one update, BN threading.

Exactness strategy: with SGD (linear in the gradient), one update from the
mean of per-micro gradients equals the mean of the per-micro updated
params — so the accumulated step is checked against two plain steps run
from the SAME initial params with the BN stats threaded between them.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
from ugpg_tpu.train.steps import (
    TrainState,
    make_cls_train_step,
    make_seg_train_epoch,
    make_seg_train_step,
)

LR = 0.05


def _seg_setup(rng, stage=2, res=16, prev_res=8, batch=4):
    # quarter-resolution shapes: the accumulation machinery under test is
    # resolution-independent and stage-2 compiles are the suite's cost
    m_prev = PGUNet1(num_classes=1) if stage == 2 else None
    m = PGUNet2(num_classes=1) if stage == 2 else PGUNet1(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, res, res, 3)), False)
    v_prev = (
        m_prev.init(jax.random.key(1), jnp.zeros((1, prev_res, prev_res, 3)), False)
        if m_prev else {}
    )
    tx = optax.sgd(LR)
    state = TrainState.create(v, tx)
    images = rng.random((batch, res, res, 3)).astype(np.float32)
    masks = (rng.random((batch, res, res, 1)) > 0.5).astype(np.float32)
    kwargs = dict(
        prev_module=m_prev, prev_resolution=prev_res if m_prev else None,
        alpha=1.0, donate=False,
    )
    return m, tx, state, v_prev, images, masks, kwargs


def test_seg_accum_matches_sequential_micro_steps(rng):
    """accum_steps=2 == mean of two plain-SGD micro updates with BN stats
    threaded sequentially (uncertainty-guided stage-2 path)."""
    m, tx, state, v_prev, images, masks, kwargs = _seg_setup(rng)
    pw = jnp.asarray(5.0)
    key = jax.random.key(7)

    accum = make_seg_train_step(m, tx, 2, 16, accum_steps=2, **kwargs)
    new_state, metrics = accum(state, v_prev, (images, masks), pw, key)

    plain = make_seg_train_step(m, tx, 2, 16, **kwargs)
    keys = jax.random.split(key, 2)
    s1, m1 = plain(state, v_prev, (images[:2], masks[:2]), pw, keys[0])
    # second micro: same params, BN stats from micro 1
    state_b = state.replace(batch_stats=s1.batch_stats)
    s2, m2 = plain(state_b, v_prev, (images[2:], masks[2:]), pw, keys[1])

    # SGD linearity: p0 - lr*(g1+g2)/2 == mean of the two updated params
    want_params = jax.tree.map(lambda a, b: (a + b) / 2, s1.params, s2.params)
    for got, want in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(want_params)
    ):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    # BN stats thread sequentially: final == micro-2's
    for got, want in zip(
        jax.tree.leaves(new_state.batch_stats), jax.tree.leaves(s2.batch_stats)
    ):
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    # metrics are means over micro-batches
    for k in ("final_loss", "dice", "accuracy", "uncertainty_weight_mean"):
        np.testing.assert_allclose(
            float(metrics[k]), (float(m1[k]) + float(m2[k])) / 2,
            rtol=1e-5, atol=1e-6,
        )
    assert int(new_state.step) == 1  # ONE optimizer step


def test_seg_accum_one_is_plain(rng):
    m, tx, state, v_prev, images, masks, kwargs = _seg_setup(rng)
    pw = jnp.asarray(5.0)
    key = jax.random.key(3)
    s_a, m_a = make_seg_train_step(m, tx, 2, 16, accum_steps=1, **kwargs)(
        state, v_prev, (images, masks), pw, key
    )
    s_b, m_b = make_seg_train_step(m, tx, 2, 16, **kwargs)(
        state, v_prev, (images, masks), pw, key
    )
    for got, want in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
        np.testing.assert_array_equal(got, want)
    np.testing.assert_array_equal(m_a["final_loss"], m_b["final_loss"])


def test_seg_accum_indivisible_batch_raises(rng):
    m, tx, state, v_prev, images, masks, kwargs = _seg_setup(rng, batch=3)
    step = make_seg_train_step(m, tx, 2, 16, accum_steps=2, **kwargs)
    with pytest.raises(ValueError, match="not divisible"):
        step(state, v_prev, (images, masks), jnp.asarray(5.0), jax.random.key(0))


def test_seg_accum_composes_with_scan_epoch(rng):
    """The whole-epoch lax.scan program accepts accumulated step bodies."""
    m, tx, state, v_prev, images, masks, kwargs = _seg_setup(rng)
    epoch = make_seg_train_epoch(
        m, tx, 2, 16, accum_steps=2, **{**kwargs, "donate": False}
    )
    stacked = (
        jnp.stack([images, images]),  # S=2 steps
        jnp.stack([masks, masks]),
    )
    keys = jax.random.split(jax.random.key(5), 2)
    new_state, ms = epoch(state, v_prev, stacked, jnp.asarray(5.0), keys)
    assert int(new_state.step) == 2
    assert np.isfinite(float(ms["final_loss"]))
    assert 0.0 <= float(ms["dice"]) <= 1.0


def test_cls_accum_matches_sequential_micro_steps(rng):
    """Classification accumulation: grads mean, correct/count SUM, dropout
    keyed per micro-batch exactly like the accumulated path."""
    res, k_cls, batch = 16, 5, 4
    m = HerlevClassificationModel(stage=1, num_classes=k_cls)
    v = m.init(jax.random.key(0), jnp.zeros((1, res, res, 3)), False)
    tx = optax.sgd(LR)
    state = TrainState.create(v, tx)
    images = rng.random((batch, res, res, 3)).astype(np.float32)
    labels = rng.integers(0, k_cls, size=batch).astype(np.int32)
    cw = jnp.ones((k_cls,), jnp.float32)
    key = jax.random.key(11)
    common = dict(donate=False, augment=False, normalize=False)

    accum = make_cls_train_step(m, tx, 1, res, k_cls, accum_steps=2, **common)
    new_state, metrics = accum(state, {}, (images, labels), cw, key)

    plain = make_cls_train_step(m, tx, 1, res, k_cls, **common)
    keys = jax.random.split(key, 2)
    s1, m1 = plain(state, {}, (images[:2], labels[:2]), cw, keys[0])
    state_b = state.replace(batch_stats=s1.batch_stats)
    s2, m2 = plain(state_b, {}, (images[2:], labels[2:]), cw, keys[1])

    want_params = jax.tree.map(lambda a, b: (a + b) / 2, s1.params, s2.params)
    for got, want in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(want_params)
    ):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    assert int(metrics["correct"]) == int(m1["correct"]) + int(m2["correct"])
    assert int(metrics["count"]) == batch
    np.testing.assert_allclose(
        float(metrics["final_loss"]),
        (float(m1["final_loss"]) + float(m2["final_loss"])) / 2,
        rtol=1e-5, atol=1e-6,
    )


def test_trainer_accum_smoke(rng, tmp_path):
    """Seg trainer with accum_steps=2 trains a tiny stage end to end."""
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {1: {"resolution": 16, "epochs_per_stage": 1, "lr": 1e-3}}
    trainer = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, accum_steps=2
    )
    images = rng.random((4, 16, 16, 3)).astype(np.float32)
    masks = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    loader = [(images, masks)]
    trainer.train_progressive(loader, loader, stages=[1],
                              save_dir=str(tmp_path))
    assert np.isfinite(trainer.history["train_loss"][-1])

    with pytest.raises(ValueError, match="accum_steps"):
        UncertaintyGuidedProgressiveTrainer(
            stage_configs=cfgs, verbose=False, accum_steps=0
        )

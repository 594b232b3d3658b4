"""Spatially-sharded TRAINING == the unsharded train step.

make_spatial_train_step runs the uncertainty-guided step at native
resolution with H (and W) sharded over the mesh: halo-exchange convs
(forward and transposed backward), global-batch BN via psum, global-mean
loss/metrics.  On identical batches it must reproduce
train.steps.make_seg_train_step (augment=False, input already at the step
resolution so the in-graph resize is the identity) to fp tolerance.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ugpg_tpu.models.pgunet import STAGE_MODELS
from ugpg_tpu.parallel.spatial import (
    make_spatial_eval_step,
    make_spatial_train_step,
)
from ugpg_tpu.train.optim import torch_rmsprop
from ugpg_tpu.train.steps import TrainState, make_seg_eval_step, make_seg_train_step


def _mesh(n_h: int, n_w: int = 1) -> Mesh:
    devs = np.asarray(jax.devices()[: n_h * n_w])
    if n_w > 1:
        return Mesh(devs.reshape(n_h, n_w), axis_names=("data", "model"))
    return Mesh(devs, axis_names=("data",))


def _init(stage, res, seed=0):
    module = STAGE_MODELS[stage](num_classes=1)
    v = module.init(jax.random.key(seed), jnp.zeros((1, res, res, 3)), False)
    return module, v


def _batch(rng, n, res):
    return (
        rng.random((n, res, res, 3), dtype=np.float32),
        (rng.random((n, res, res, 1)) > 0.6).astype(np.float32),
    )


def _ref_step_metrics(module, v, batch, stage, res, prev=None, steps=1):
    """Unsharded reference trajectory via make_seg_train_step."""
    tx = torch_rmsprop(3e-4, weight_decay=1e-4)
    state = TrainState.create(v, tx)
    prev_module, prev_v, prev_res = prev or (None, {}, None)
    step = make_seg_train_step(
        module, tx, stage, res, prev_module=prev_module,
        prev_resolution=prev_res, donate=False, augment=False,
    )
    m = None
    for _ in range(steps):
        state, m = step(state, prev_v, batch, jnp.asarray(5.0), jax.random.key(0))
    return state, m


def _spatial_step_metrics(v, batch, stage, mesh, w_axis=None, prev=None,
                          steps=1):
    tx = torch_rmsprop(3e-4, weight_decay=1e-4)
    state = TrainState.create(v, tx)
    prev_stage, prev_v = prev or (None, {})
    step = make_spatial_train_step(
        stage, mesh, tx, w_axis=w_axis, prev_stage=prev_stage,
    )
    m = None
    for _ in range(steps):
        state, m = step(state, prev_v, batch, 5.0)
    return state, m


_KEYS = ("final_loss", "base_loss", "dice", "accuracy",
         "uncertainty_weight_mean", "uncertainty_weight_std")


def _assert_metrics_close(got, want, rtol=2e-4, atol=1e-5):
    for k in _KEYS:
        np.testing.assert_allclose(
            float(got[k]), float(want[k]), rtol=rtol, atol=atol, err_msg=k
        )


def test_spatial_train_stage1_matches_unsharded(rng):
    module, v = _init(1, 32)
    batch = _batch(rng, 2, 32)
    s_ref, m_ref = _ref_step_metrics(module, v, batch, 1, 32)
    s_sp, m_sp = _spatial_step_metrics(v, batch, 1, _mesh(2))
    _assert_metrics_close(m_sp, m_ref)
    # BN running stats: global-batch semantics must match exactly-ish
    a = np.asarray(s_ref.batch_stats["inc"]["conv"]["bn1"]["mean"])
    b = np.asarray(s_sp.batch_stats["inc"]["conv"]["bn1"]["mean"])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    # params after one RMSprop update (first step ~ sign descent: loose max)
    pa = np.asarray(s_ref.params["inc"]["conv"]["conv1"]["kernel"])
    pb = np.asarray(s_sp.params["inc"]["conv"]["conv1"]["kernel"])
    assert np.mean(np.abs(pa - pb)) < 1e-4


def test_spatial_train_stage2_uncertainty_matches_unsharded(rng):
    """Stage 2 with the frozen stage-1 uncertainty source, 2-D (2x2) grid."""
    m1, v1 = _init(1, 32, seed=0)
    m2, v2 = _init(2, 64, seed=1)
    batch = _batch(rng, 2, 64)
    _, m_ref = _ref_step_metrics(
        m2, v2, batch, 2, 64, prev=(m1, v1, 32)
    )
    _, m_sp = _spatial_step_metrics(
        v2, batch, 2, _mesh(2, 2), w_axis="model", prev=(1, v1)
    )
    assert float(m_sp["uncertainty_weight_mean"]) > 0
    _assert_metrics_close(m_sp, m_ref)


def test_spatial_train_multi_step_trajectory(rng):
    """3 RMSprop steps stay coupled (loss falls identically-ish)."""
    module, v = _init(1, 32, seed=2)
    batch = _batch(rng, 4, 32)
    _, m_ref = _ref_step_metrics(module, v, batch, 1, 32, steps=3)
    _, m_sp = _spatial_step_metrics(v, batch, 1, _mesh(2), steps=3)
    np.testing.assert_allclose(
        float(m_sp["final_loss"]), float(m_ref["final_loss"]), rtol=5e-3
    )
    np.testing.assert_allclose(
        float(m_sp["dice"]), float(m_ref["dice"]), rtol=5e-3, atol=1e-3
    )


def test_spatial_unc_scale_matches_prev_stage_gap(rng):
    """prev_stage two stages back (factor 4): the frozen forward must run
    at quarter scale, matching the unsharded step's prev_resolution."""
    m1, v1 = _init(1, 8, seed=0)
    m3, v3 = _init(3, 32, seed=1)
    batch = _batch(rng, 2, 32)
    _, m_ref = _ref_step_metrics(m3, v3, batch, 3, 32, prev=(m1, v1, 8))
    _, m_sp = _spatial_step_metrics(v3, batch, 3, _mesh(2), prev=(1, v1))
    _assert_metrics_close(m_sp, m_ref)


def test_spatial_infer_is_memoized():
    """Repeated make_spatial_infer calls return ONE jit wrapper (per-call
    re-tracing would recompile the stage forward for every slide)."""
    from ugpg_tpu.parallel.spatial import make_spatial_infer

    mesh = _mesh(2)
    a = make_spatial_infer(2, mesh, "data", None, None)
    b = make_spatial_infer(2, mesh, "data", None, None)
    assert a is b


def test_spatial_eval_step_matches_unsharded(rng):
    m1, v1 = _init(1, 32, seed=0)
    m2, v2 = _init(2, 64, seed=1)
    batch = _batch(rng, 2, 64)
    ref = make_seg_eval_step(m2, 2, 64, prev_module=m1, prev_resolution=32)(
        v2, v1, batch, jnp.asarray(5.0)
    )
    got = make_spatial_eval_step(2, _mesh(2), prev_stage=1)(
        v2, v1, batch, 5.0
    )
    _assert_metrics_close(got, ref)


def test_finetune_native_learns_and_saves(tmp_path, rng):
    """Trainer surface: finetune_native on a learnable disk dataset — loss
    falls, dice rises, odd native sizes crop to the grid divisor, the
    fine-tuned weights replace the stage's and a _native checkpoint lands."""
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.io.checkpoint import has_checkpoint
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    imgs, masks = disk_dataset(num_samples=4, image_size=50, seed=9)  # odd
    loader = ArrayLoader(imgs, masks, batch_size=2)
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs={
            1: {"resolution": 16, "epochs_per_stage": 1, "lr": 3e-4},
            2: {"resolution": 32, "epochs_per_stage": 1, "lr": 3e-4},
        },
        verbose=False,
    )
    tr._ensure_variables(1)  # frozen uncertainty source for stage 2
    hist = tr.finetune_native(
        loader, stage=2, epochs=3, mesh=_mesh(2), val_loader=loader,
        save_dir=tmp_path,
    )
    assert hist["train_loss"][-1] < hist["train_loss"][0]
    assert hist["train_dice"][-1] > hist["train_dice"][0]
    assert len(hist["val_dice"]) == 3
    assert has_checkpoint(tmp_path / "ug_pgunet_stage2_native")
    # fine-tuned weights are the trainer's stage-2 weights now
    assert tr.variables[2]["params"] is tr._state.params


def test_finetune_native_inherits_bf16(rng):
    """A bf16 trainer's native fine-tune runs the bf16 compute path (the
    dtype is inherited, not silently dropped to f32)."""
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    imgs, masks = disk_dataset(num_samples=2, image_size=32, seed=11)
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs={1: {"resolution": 16, "epochs_per_stage": 1,
                           "lr": 3e-4}},
        verbose=False, dtype=jnp.bfloat16,
    )
    hist = tr.finetune_native(
        ArrayLoader(imgs, masks, batch_size=2), stage=1, epochs=1,
        mesh=_mesh(2),
    )
    assert np.isfinite(hist["train_loss"][0])
    # f32 override still accepted
    hist32 = tr.finetune_native(
        ArrayLoader(imgs, masks, batch_size=2), stage=1, epochs=1,
        mesh=_mesh(2), dtype=None,
    )
    assert np.isfinite(hist32["train_loss"][0])


def test_finetune_native_accum_default(rng):
    """An accum-configured trainer fine-tunes batch-1 native slides out
    of the box (regression: finetune_native inheriting the trainer's
    accum_steps=2 made batch-1 spatial steps raise after the whole
    pyramid had trained — the default is now 1), and accumulation is an
    explicit opt-in for divisible multi-slide batches."""
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    imgs, masks = disk_dataset(num_samples=2, image_size=32, seed=13)
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs={1: {"resolution": 16, "epochs_per_stage": 1,
                           "lr": 3e-4}},
        verbose=False, accum_steps=2,
    )
    hist = tr.finetune_native(
        ArrayLoader(imgs, masks, batch_size=1), stage=1, epochs=1,
        mesh=_mesh(2),
    )
    assert np.isfinite(hist["train_loss"][0])
    # explicit opt-in works on divisible batches
    hist2 = tr.finetune_native(
        ArrayLoader(imgs, masks, batch_size=2), stage=1, epochs=1,
        mesh=_mesh(2), accum_steps=2,
    )
    assert np.isfinite(hist2["train_loss"][0])


def test_spatial_train_rejects_indivisible(rng):
    tx = torch_rmsprop(3e-4)
    _, v = _init(1, 32)
    state = TrainState.create(v, tx)
    # donate=False: this test reuses `state` across calls
    step = make_spatial_train_step(1, _mesh(2), tx, donate=False)
    x = np.zeros((1, 36, 36, 3), np.float32)  # 36 % (2*2) == 0 but 36 % 4 ok
    y = np.zeros((1, 36, 36, 1), np.float32)
    step(state, {}, (x, y), 5.0)  # 36 divisible by 2 shards * 2^1 -> fine
    bad = np.zeros((1, 34, 34, 3), np.float32)  # 34 % 4 != 0
    with pytest.raises(ValueError, match="divisible"):
        step(state, {}, (bad, bad[..., :1]), 5.0)


def test_spatial_train_step_accum_matches_sequential(rng):
    """accum_steps=2 on the spatial grid == mean of two sequential
    spatial micro-steps (SGD linearity), BN stats threaded."""
    import optax

    stage, res = 1, 16
    _, v = _init(stage, res)
    mesh = _mesh(2)
    tx = optax.sgd(0.05)
    x, y = _batch(rng, 4, res)

    accum = make_spatial_train_step(stage, mesh, tx, donate=False,
                                    accum_steps=2)
    state = TrainState.create(v, tx)
    new_state, metrics = accum(state, {}, (x, y), 5.0)

    plain = make_spatial_train_step(stage, mesh, tx, donate=False)
    s1, m1 = plain(TrainState.create(v, tx), {}, (x[:2], y[:2]), 5.0)
    state_b = TrainState.create(v, tx).replace(batch_stats=s1.batch_stats)
    s2, m2 = plain(state_b, {}, (x[2:], y[2:]), 5.0)

    want_params = jax.tree.map(lambda a, b: (a + b) / 2, s1.params, s2.params)
    for got, want in zip(
        jax.tree.leaves(new_state.params), jax.tree.leaves(want_params)
    ):
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-6)
    for got, want in zip(
        jax.tree.leaves(new_state.batch_stats),
        jax.tree.leaves(s2.batch_stats),
    ):
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(
        float(metrics["final_loss"]),
        (float(m1["final_loss"]) + float(m2["final_loss"])) / 2,
        rtol=1e-5, atol=1e-6,
    )
    assert int(new_state.step) == 1

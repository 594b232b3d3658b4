"""Pipeline-parallel uncertainty stage (parallel/pipeline.py).

The frozen prev-stage forward runs as its own program on a disjoint device
group; these tests prove the pipelined trajectory is the SAME computation
as the fused single-program step (ref semantics: UG_unet.py:19-59 inside
uncertainty_guided_trainer.py:143-157), just scheduled across two meshes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.data.synthetic import disk_dataset
from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
from ugpg_tpu.parallel.pipeline import UncertaintyPipeline, split_devices
from ugpg_tpu.train.optim import torch_rmsprop
from ugpg_tpu.train.steps import TrainState, make_seg_train_step

RES, PREV_RES, BATCH, STEPS = 32, 16, 8, 4
POS_W = 5.0


def _models_and_batches(seed=0, width=1.0):
    """``width < 1``: narrow variants (same topology/names) — the pipeline
    equivalence semantics are width-independent, and the fake-8-device CPU
    backend executes each device's convs SEQUENTIALLY at the conftest's
    highest matmul precision, so full-width mesh programs crawl (XLA CPU's
    40 s collective rendezvous can even abort when one shard's convs run
    that long)."""
    m1 = PGUNet1(num_classes=1, width=width)
    m2 = PGUNet2(num_classes=1, width=width)
    v1 = m1.init(jax.random.key(seed), jnp.zeros((1, PREV_RES, PREV_RES, 3)), False)
    v2 = m2.init(jax.random.key(seed + 1), jnp.zeros((1, RES, RES, 3)), False)
    images, masks = disk_dataset(num_samples=BATCH * STEPS, image_size=RES)
    batches = [
        (np.asarray(images[i * BATCH:(i + 1) * BATCH]),
         np.asarray(masks[i * BATCH:(i + 1) * BATCH]))
        for i in range(STEPS)
    ]
    keys = list(jax.random.split(jax.random.key(7), STEPS))
    return m1, m2, v1, v2, batches, keys


def _fused_trajectory(m1, m2, v1, v2, batches, keys, augment):
    """Reference: the fused single-program step on one device."""
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    state = TrainState.create(v2, tx)
    step = make_seg_train_step(
        m2, tx, 2, RES, prev_module=m1, prev_resolution=PREV_RES,
        donate=False, augment=augment,
    )
    pos_w = jnp.asarray(POS_W)
    out = []
    for (im, ms), k in zip(batches, keys):
        state, m = step(state, v1, (jnp.asarray(im), jnp.asarray(ms)), pos_w, k)
        out.append(m)
    return state, out


def _pipelined_trajectory(m1, m2, v1, v2, batches, keys, augment, **kw):
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    pipe = UncertaintyPipeline(
        m2, m1, tx, stage=2, resolution=RES, prev_resolution=PREV_RES,
        augment=augment, donate=False, **kw,
    )
    state = pipe.create_state(v2)
    prev = pipe.place_prev(v1)
    return pipe, *pipe.run_epoch(state, prev, batches, POS_W, keys)


def _assert_matches(want_state, want_ms, got_state, got_ms,
                    step0_rtol=2e-5, traj_rtol=5e-2):
    """Step 0 must match tightly (same math, different schedule); later
    steps loosen to ``traj_rtol`` — RMSprop's early near-sign-descent
    updates amplify GSPMD reduction-order noise across a trajectory
    (measured ~2% dice drift by step 2 here; same effect as
    tests/test_parallel.py::test_seg_trainer_progressive_...)."""
    for i, (w, g) in enumerate(zip(want_ms, got_ms)):
        rtol = step0_rtol if i == 0 else traj_rtol
        for key in ("final_loss", "dice", "uncertainty_weight_mean"):
            np.testing.assert_allclose(
                float(g[key]), float(w[key]), rtol=rtol, atol=1e-6,
                err_msg=f"step {i}: {key}",
            )
    wl = jax.tree.leaves(want_state.params)
    gl = jax.tree.leaves(got_state.params)
    for w, g in zip(wl, gl):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=traj_rtol, atol=traj_rtol
        )


def test_pipelined_matches_fused_step():
    m1, m2, v1, v2, batches, keys = _models_and_batches(width=0.25)
    want_state, want_ms = _fused_trajectory(m1, m2, v1, v2, batches, keys, False)
    pipe, got_state, got_ms = _pipelined_trajectory(
        m1, m2, v1, v2, batches, keys, False, n_unc=4,
    )
    assert len(got_ms) == STEPS
    # the two groups really are disjoint
    train_devs = set(pipe.train_mesh.devices.flat)
    unc_devs = set(pipe.unc_mesh.devices.flat)
    assert not train_devs & unc_devs
    assert float(got_ms[0]["uncertainty_weight_mean"]) > 0.0
    _assert_matches(want_state, want_ms, got_state, got_ms)


def test_pipelined_matches_fused_step_augmented():
    """Same rng drives the augmentation in BOTH programs -> identical pixels
    reach the frozen forward, so trajectories still match."""
    m1, m2, v1, v2, batches, keys = _models_and_batches(seed=3, width=0.25)
    want_state, want_ms = _fused_trajectory(m1, m2, v1, v2, batches, keys, True)
    _, got_state, got_ms = _pipelined_trajectory(
        m1, m2, v1, v2, batches, keys, True, n_unc=4,
    )
    _assert_matches(want_state, want_ms, got_state, got_ms)


def test_pipeline_depth_invariance():
    """depth only changes the schedule, never the math."""
    m1, m2, v1, v2, batches, keys = _models_and_batches(seed=5, width=0.25)
    _, s1, ms1 = _pipelined_trajectory(
        m1, m2, v1, v2, batches, keys, False, n_unc=4, depth=1,
    )
    _, s3, ms3 = _pipelined_trajectory(
        m1, m2, v1, v2, batches, keys, False, n_unc=4, depth=3,
    )
    # identical programs + identical inputs -> identical trajectories
    _assert_matches(s1, ms1, s3, ms3, step0_rtol=1e-6, traj_rtol=1e-6)


def test_cls_pipelined_matches_fused_step():
    """Classification: per-sample (B,) weights pipelined from the unc group;
    augmentation AND ImageNet normalization replicated in the producer with
    the step's exact rng split, dropout keys untouched."""
    from ugpg_tpu.models.classifier import HerlevClassificationModel
    from ugpg_tpu.train.steps import make_cls_train_step

    res, prev_res, k_cls, batch, steps = 32, 16, 5, 8, 3
    rng = np.random.default_rng(11)
    m1 = HerlevClassificationModel(stage=1, num_classes=k_cls)
    m2 = HerlevClassificationModel(stage=2, num_classes=k_cls)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, prev_res, prev_res, 3)), False)
    v2 = m2.init(jax.random.key(1), jnp.zeros((1, res, res, 3)), False)
    batches = [
        (rng.random((batch, res, res, 3)).astype(np.float32),
         rng.integers(0, k_cls, size=batch).astype(np.int32))
        for _ in range(steps)
    ]
    cw = np.ones((k_cls,), np.float32)
    keys = list(jax.random.split(jax.random.key(9), steps))
    common = dict(augment=True, normalize=True)

    tx = torch_rmsprop(1e-4)
    state = TrainState.create(v2, tx)
    step = make_cls_train_step(
        m2, tx, 2, res, k_cls, prev_module=m1, prev_resolution=prev_res,
        donate=False, **common,
    )
    want_ms = []
    for (im, lb), k in zip(batches, keys):
        state, m = step(state, v1, (jnp.asarray(im), jnp.asarray(lb)),
                        jnp.asarray(cw), k)
        want_ms.append(m)

    tx2 = torch_rmsprop(1e-4)
    pipe = UncertaintyPipeline(
        m2, m1, tx2, stage=2, resolution=res, prev_resolution=prev_res,
        task_type="classification", num_classes=k_cls, n_unc=4,
        donate=False, **common,
    )
    got_state = pipe.create_state(v2)
    prev = pipe.place_prev(v1)
    got_state, got_ms = pipe.run_epoch(got_state, prev, batches, cw, keys)

    for i, (w, g) in enumerate(zip(want_ms, got_ms)):
        rtol = 2e-5 if i == 0 else 5e-2
        for key in ("final_loss", "uncertainty_weight_mean"):
            np.testing.assert_allclose(
                float(g[key]), float(w[key]), rtol=rtol, atol=1e-6,
                err_msg=f"step {i}: {key}",
            )
        assert int(g["correct"]) == int(w["correct"]) or i > 0
    assert float(got_ms[0]["uncertainty_weight_mean"]) > 1.0  # 1 + alpha*A


def test_pipelined_accum_matches_fused_accum():
    """pipeline_unc × gradient accumulation: the producer replicates the
    per-micro augmentation keying, the consumer splits the precomputed map
    into micro-batches — trajectory matches the fused accum step."""
    m1, m2, v1, v2, batches, keys = _models_and_batches(seed=7, width=0.25)
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    state = TrainState.create(v2, tx)
    step = make_seg_train_step(
        m2, tx, 2, RES, prev_module=m1, prev_resolution=PREV_RES,
        donate=False, augment=True, accum_steps=2,
    )
    pos_w = jnp.asarray(POS_W)
    want_ms = []
    for (im, ms), k in zip(batches, keys):
        state, m = step(state, v1, (jnp.asarray(im), jnp.asarray(ms)), pos_w, k)
        want_ms.append(m)

    _, got_state, got_ms = _pipelined_trajectory(
        m1, m2, v1, v2, batches, keys, True, n_unc=4, accum_steps=2,
    )
    _assert_matches(state, want_ms, got_state, got_ms)


def test_pipelined_scan_matches_fused_trajectory():
    """pipeline_unc × scan_epochs (chunk-level pipelining): the unc group
    produces a stacked block of maps per chunk while the train group scans
    the previous chunk; final params and epoch-mean metrics match the
    fused per-step trajectory, and chunking/double-buffering never changes
    the math."""
    m1, m2, v1, v2, batches, keys = _models_and_batches(seed=9, width=0.25)
    want_state, want_ms = _fused_trajectory(m1, m2, v1, v2, batches, keys, True)

    def scan_run(chunk_bytes):
        tx = torch_rmsprop(1e-4, weight_decay=1e-4)
        pipe = UncertaintyPipeline(
            m2, m1, tx, stage=2, resolution=RES, prev_resolution=PREV_RES,
            augment=True, donate=False, n_unc=4,
        )
        state = pipe.create_state(v2)
        prev = pipe.place_prev(v1)
        return pipe.run_epoch_scan(
            state, prev, batches, POS_W, jnp.stack(keys),
            chunk_bytes=chunk_bytes,
        )

    # one chunk: epoch-mean metrics vs the fused per-step means
    s_one, parts_one, tail_one = scan_run(None)
    assert len(parts_one) == 1 and parts_one[0][1] == STEPS and not tail_one
    want_host = jax.device_get(want_ms)
    for key in ("final_loss", "dice", "uncertainty_weight_mean"):
        want_mean = float(np.mean([float(m[key]) for m in want_host]))
        np.testing.assert_allclose(
            float(parts_one[0][0][key]), want_mean, rtol=5e-2, atol=1e-6,
            err_msg=key,
        )
    for w, g in zip(jax.tree.leaves(want_state.params),
                    jax.tree.leaves(s_one.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-2, atol=5e-2)

    # two chunks (double-buffered): identical math to the one-chunk run
    per_batch = batches[0][0].nbytes + batches[0][1].nbytes
    s_two, parts_two, tail_two = scan_run(2 * per_batch)
    assert len(parts_two) == 2 and not tail_two
    for w, g in zip(jax.tree.leaves(s_one.params),
                    jax.tree.leaves(s_two.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=1e-6, atol=1e-6)


@pytest.mark.slow
def test_cls_pipelined_scan_matches_fused_trajectory():
    """Classification run_epoch_scan: stacked (S, B) weight blocks from the
    unc group drive the scanned external-uncertainty epoch program.
    (slow: the classifier has no narrow-width variant and full-width mesh
    programs execute serially per fake device; the seg tests cover the
    run_epoch_scan machinery on the default suite.)"""
    from ugpg_tpu.models.classifier import HerlevClassificationModel
    from ugpg_tpu.train.steps import make_cls_train_step

    res, prev_res, k_cls, batch, steps = 32, 16, 4, 8, 3
    rng = np.random.default_rng(21)
    m1 = HerlevClassificationModel(stage=1, num_classes=k_cls)
    m2 = HerlevClassificationModel(stage=2, num_classes=k_cls)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, prev_res, prev_res, 3)), False)
    v2 = m2.init(jax.random.key(1), jnp.zeros((1, res, res, 3)), False)
    batches = [
        (rng.random((batch, res, res, 3)).astype(np.float32),
         rng.integers(0, k_cls, size=batch).astype(np.int32))
        for _ in range(steps)
    ]
    cw = np.ones((k_cls,), np.float32)
    keys = list(jax.random.split(jax.random.key(13), steps))
    common = dict(augment=True, normalize=True)

    tx = torch_rmsprop(1e-4)
    state = TrainState.create(v2, tx)
    step = make_cls_train_step(
        m2, tx, 2, res, k_cls, prev_module=m1, prev_resolution=prev_res,
        donate=False, **common,
    )
    want_ms = []
    for (im, lb), k in zip(batches, keys):
        state, m = step(state, v1, (jnp.asarray(im), jnp.asarray(lb)),
                        jnp.asarray(cw), k)
        want_ms.append(m)

    tx2 = torch_rmsprop(1e-4)
    pipe = UncertaintyPipeline(
        m2, m1, tx2, stage=2, resolution=res, prev_resolution=prev_res,
        task_type="classification", num_classes=k_cls, n_unc=4,
        donate=False, **common,
    )
    got_state = pipe.create_state(v2)
    prev = pipe.place_prev(v1)
    got_state, parts, tail = pipe.run_epoch_scan(
        got_state, prev, batches, cw, jnp.stack(keys), chunk_bytes=None,
    )
    assert len(parts) == 1 and parts[0][1] == steps and not tail
    want_host = jax.device_get(want_ms)
    mm = parts[0][0]
    np.testing.assert_allclose(
        float(mm["final_loss"]),
        float(np.mean([float(m["final_loss"]) for m in want_host])),
        rtol=5e-2, atol=1e-6,
    )
    # correct/count come back SUMMED over the scanned steps
    assert int(mm["count"]) == batch * steps
    assert float(mm["uncertainty_weight_mean"]) > 1.0
    for w, g in zip(jax.tree.leaves(state.params),
                    jax.tree.leaves(got_state.params)):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=5e-2, atol=5e-2)


def test_trainer_pipeline_scan_matches_plain_scan(tmp_path):
    """Trainer-level composition: pipeline_unc=4 + scan_epochs tracks the
    plain scan_epochs trainer (stage 1 identical — same plain scan path;
    stage 2 chunk-pipelined within GSPMD rounding)."""
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {
        1: {"resolution": 16, "epochs_per_stage": 2, "lr": 3e-4},
        2: {"resolution": 32, "epochs_per_stage": 2, "lr": 1e-4},
    }
    images, masks = disk_dataset(num_samples=16, image_size=32, seed=8)
    train = ArrayLoader(images[:8], masks[:8], batch_size=8)
    val = ArrayLoader(images[8:], masks[8:], batch_size=8)

    plain = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, scan_epochs=True, width=0.25
    )
    h0 = plain.train_progressive(train, val, max_stages=2,
                                 save_dir=tmp_path / "plain")
    piped = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, scan_epochs=True, pipeline_unc=4,
        width=0.25,
    )
    h1 = piped.train_progressive(train, val, max_stages=2,
                                 save_dir=tmp_path / "piped")

    np.testing.assert_allclose(h1["train_loss"][:2], h0["train_loss"][:2],
                               rtol=1e-6)
    np.testing.assert_allclose(h1["train_loss"][2:], h0["train_loss"][2:],
                               rtol=1e-3)
    np.testing.assert_allclose(h1["val_dice"], h0["val_dice"], atol=1e-3)
    assert (tmp_path / "piped" / "ug_pgunet_stage2_best").exists()


def test_split_devices_and_validation():
    train, unc = split_devices(2)
    assert len(train) == 6 and len(unc) == 2
    assert not set(train) & set(unc)
    with pytest.raises(ValueError):
        split_devices(8)
    with pytest.raises(ValueError):
        split_devices(0)

    m1, m2 = PGUNet1(num_classes=1), PGUNet2(num_classes=1)
    tx = torch_rmsprop(1e-4)
    with pytest.raises(ValueError):  # stage 1 has nothing to offload
        UncertaintyPipeline(m2, m1, tx, stage=1, resolution=32, prev_resolution=16)
    with pytest.raises(ValueError):  # depth must be >= 1
        UncertaintyPipeline(
            m2, m1, tx, stage=2, resolution=32, prev_resolution=16, depth=0
        )


def test_run_epoch_rejects_ragged_final_batch():
    """drop_last=False loaders produce a short final batch — run_epoch must
    reject it up front with the sizing message, not crash deep in
    device_put after the epoch has been dispatched."""
    m1, m2 = PGUNet1(num_classes=1), PGUNet2(num_classes=1)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, PREV_RES, PREV_RES, 3)), False)
    v2 = m2.init(jax.random.key(1), jnp.zeros((1, RES, RES, 3)), False)
    pipe = UncertaintyPipeline(
        m2, m1, torch_rmsprop(1e-4), stage=2, resolution=RES,
        prev_resolution=PREV_RES, n_unc=4, donate=False,
    )
    state = pipe.create_state(v2)
    prev = pipe.place_prev(v1)
    rng = np.random.default_rng(0)
    full = (rng.random((8, RES, RES, 3), dtype=np.float32),
            rng.random((8, RES, RES, 1), dtype=np.float32))
    ragged = (full[0][:6], full[1][:6])  # 6 % 4 != 0
    keys = list(jax.random.split(jax.random.key(2), 2))
    with pytest.raises(ValueError, match="batch 1 has size 6"):
        pipe.run_epoch(state, prev, [full, ragged], POS_W, keys)


def test_trainer_pipeline_unc_matches_plain_trainer(tmp_path):
    """pipeline_unc=N on the progressive trainer: stage 1 runs the normal
    per-step path (bit-identical), stage 2 pipelines the frozen stage-1
    forward onto its own device group and tracks the fused-step trainer
    within GSPMD rounding; checkpoints/metrics flow unchanged."""
    from ugpg_tpu.data.synthetic import ArrayLoader
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {
        1: {"resolution": 16, "epochs_per_stage": 2, "lr": 3e-4},
        2: {"resolution": 32, "epochs_per_stage": 2, "lr": 1e-4},
    }
    images, masks = disk_dataset(num_samples=16, image_size=32, seed=5)
    train = ArrayLoader(images[:8], masks[:8], batch_size=8)
    val = ArrayLoader(images[8:], masks[8:], batch_size=8)

    plain = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs,
                                            verbose=False, width=0.25)
    h0 = plain.train_progressive(train, val, max_stages=2,
                                 save_dir=tmp_path / "plain")
    piped = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, pipeline_unc=4, width=0.25
    )
    h1 = piped.train_progressive(train, val, max_stages=2,
                                 save_dir=tmp_path / "piped")

    # stage 1: identical path, identical key stream
    np.testing.assert_allclose(h1["train_loss"][:2], h0["train_loss"][:2],
                               rtol=1e-6)
    # stage 2: pipelined == fused within GSPMD reduction rounding
    np.testing.assert_allclose(h1["train_loss"][2:], h0["train_loss"][2:],
                               rtol=1e-3)
    np.testing.assert_allclose(h1["val_dice"], h0["val_dice"], atol=1e-3)
    assert (tmp_path / "piped" / "ug_pgunet_stage2_best").exists()


def test_trainer_pipeline_unc_validation():
    from ugpg_tpu.parallel.mesh import make_mesh
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    with pytest.raises(ValueError, match="mutually exclusive"):
        UncertaintyGuidedProgressiveTrainer(
            verbose=False, pipeline_unc=2, mesh=make_mesh(n_data=2)
        )
    # scan_epochs and accum_steps now COMPOSE with pipeline_unc
    # (chunk-level pipelining / micro-batch map splitting) — construction
    # must succeed
    UncertaintyGuidedProgressiveTrainer(
        verbose=False, pipeline_unc=2, scan_epochs=True, accum_steps=2
    )


def test_herlev_trainer_pipeline_unc_matches_plain_trainer(tmp_path):
    """pipeline_unc=N on the Herlev trainer: stage 1 runs the normal per-step
    path (identical key stream), stage 2 pipelines the frozen stage-1 forward
    (per-sample entropy weights) onto its own device group and tracks the
    fused-step trainer within GSPMD rounding; checkpoints flow unchanged."""
    from ugpg_tpu.data.synthetic import ArrayLoader
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    rng = np.random.default_rng(3)
    k = 3
    labels = rng.integers(0, k, size=24).astype(np.int64)
    images = (rng.random((24, 32, 32, 3)).astype(np.float32) * 0.3)
    for i, lab in enumerate(labels):
        images[i, :, :, lab % 3] += 0.6
    train = ArrayLoader(images[:16], labels[:16], batch_size=8)
    val = ArrayLoader(images[16:], labels[16:], batch_size=8)

    def cfg():
        c = create_config()
        c.update(num_classes=k, epochs_per_stage=2, stages=[1, 2],
                 verbose=False, augment=False)
        return c

    plain = HerlevTrainer(cfg())
    h0 = plain.train_progressive(train, val, str(tmp_path / "plain"))

    c1 = cfg()
    c1["pipeline_unc"] = 4
    piped = HerlevTrainer(c1)
    h1 = piped.train_progressive(train, val, str(tmp_path / "piped"))

    # stage 1: identical path, identical key stream
    np.testing.assert_allclose(h1["train_loss"][:2], h0["train_loss"][:2],
                               rtol=1e-6)
    # stage 2: pipelined == fused within GSPMD reduction rounding
    np.testing.assert_allclose(h1["train_loss"][2:], h0["train_loss"][2:],
                               rtol=1e-3)
    np.testing.assert_allclose(h1["val_acc"], h0["val_acc"], atol=1e-6)
    # uncertainty weights flowed (1 + alpha*A in [1, 1+alpha])
    assert 1.0 <= h1["uncertainty_weights_mean"][-1] <= 2.0 + 1e-6
    assert (tmp_path / "piped" / "herlev_stage2_best").exists()


def test_herlev_trainer_pipeline_unc_validation():
    from ugpg_tpu.parallel.mesh import make_mesh
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    def cfg(**kw):
        c = create_config()
        c.update(num_classes=3, verbose=False, **kw)
        return c

    with pytest.raises(ValueError, match="mutually exclusive"):
        HerlevTrainer(cfg(pipeline_unc=2), mesh=make_mesh(n_data=2))
    # scan_epochs/accum_steps now compose with pipeline_unc
    HerlevTrainer(cfg(pipeline_unc=2, scan_epochs=True, accum_steps=2))

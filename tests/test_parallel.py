"""Sharding tests on the fake 8-device CPU mesh (SPMD over ICI design)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
from ugpg_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_batch,
    shard_variables,
)
from ugpg_tpu.train.optim import torch_rmsprop
from ugpg_tpu.train.steps import TrainState, make_seg_train_step


def test_eight_fake_devices_present():
    assert len(jax.devices()) == 8


def test_make_mesh_shapes():
    mesh = make_mesh()
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh = make_mesh(n_data=4, n_model=2)
    assert dict(mesh.shape) == {"data": 4, "model": 2}


def test_param_shardings_tp_cuts_wide_convs():
    mesh = make_mesh(n_data=4, n_model=2)
    m = PGUNet1(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    sh = param_shardings(v, mesh)
    wide = sh["params"]["down4"]["conv"]["conv1"]["kernel"]
    assert wide.spec == P(None, None, None, "model")
    bias = sh["params"]["down4"]["conv"]["conv1"]["bias"]
    assert bias.spec == P()
    # 1-class output head (1 channel) stays replicated
    head = sh["params"]["outc"]["conv"]["kernel"]
    assert head.spec == P()


def test_dp_sharded_batch_layout():
    mesh = make_mesh()
    x = np.zeros((16, 8, 8, 3), np.float32)
    xs = shard_batch((x,), mesh)[0]
    assert xs.sharding.spec == P("data")
    # each device holds 2 rows of the batch
    assert xs.addressable_shards[0].data.shape[0] == 2


def test_dp_train_step_matches_single_device(rng):
    """The sharded train step must produce the same numbers as unsharded."""
    mesh = make_mesh()  # 8-way DP
    m = PGUNet1(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    tx = torch_rmsprop(3e-4)
    images = rng.random((8, 32, 32, 3)).astype(np.float32)
    masks = (rng.random((8, 32, 32, 1)) > 0.5).astype(np.float32)
    pw = jnp.asarray(5.0)
    key = jax.random.key(1)

    step = make_seg_train_step(m, tx, 1, 32, donate=False)

    # single-device reference
    state0 = TrainState.create(v, tx)
    s_ref, m_ref = step(state0, {}, (jnp.asarray(images), jnp.asarray(masks)), pw, key)

    # sharded
    v_sh = shard_variables(v, mesh)
    state1 = TrainState.create(v_sh, tx)
    batch = shard_batch((images, masks), mesh)
    s_dp, m_dp = step(state1, {}, batch, pw, key)

    np.testing.assert_allclose(
        float(m_ref["final_loss"]), float(m_dp["final_loss"]), rtol=2e-5
    )
    np.testing.assert_allclose(
        float(m_ref["dice"]), float(m_dp["dice"]), rtol=2e-5
    )
    # params agree after the update (global-batch BN + all-reduced grads).
    # Caveat: RMSprop's first step is g/(0.1|g| + eps) ~ sign(g)*10*lr, so
    # reduction-order noise on near-zero grads flips a few elements by
    # ~2*10*lr = 6e-3 — inherent to the optimizer, not a sharding bug.
    a = np.asarray(s_ref.params["inc"]["conv"]["conv1"]["kernel"])
    b = np.asarray(s_dp.params["inc"]["conv"]["conv1"]["kernel"])
    assert np.mean(np.abs(a - b)) < 1e-4
    assert np.abs(a - b).max() < 2e-2


def test_dp_tp_stage2_uncertainty_step(rng):
    """Full stage-2 step (frozen prev fwd + weighted loss) on a 2x2 mesh."""
    mesh = make_mesh(n_data=2, n_model=2)
    m1 = PGUNet1(num_classes=1)
    m2 = PGUNet2(num_classes=1)
    v1 = shard_variables(
        m1.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False), mesh
    )
    v2 = shard_variables(
        m2.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)), False), mesh
    )
    tx = torch_rmsprop(1e-4)
    state = TrainState.create(v2, tx)
    step = make_seg_train_step(
        m2, tx, 2, 64, prev_module=m1, prev_resolution=32, donate=False
    )
    batch = shard_batch(
        (
            rng.random((4, 64, 64, 3)).astype(np.float32),
            (rng.random((4, 64, 64, 1)) > 0.5).astype(np.float32),
        ),
        mesh,
    )
    new_state, metrics = step(state, v1, batch, jnp.asarray(5.0), jax.random.key(2))
    assert np.isfinite(float(metrics["final_loss"]))
    assert float(metrics["uncertainty_weight_mean"]) > 0.5
    # TP layout preserved through the optimizer update
    k = new_state.params["down4"]["conv"]["conv1"]["kernel"]
    assert k.sharding.spec == P(None, None, None, "model")


def test_graft_entry_and_dryrun():
    import __graft_entry__ as ge

    fn, (variables, images) = ge.entry()
    out = jax.jit(fn)(variables, images)
    preds, probs, unc = out
    assert preds.shape == (8, 256, 256, 1)
    assert 0.0 <= float(unc.min()) and float(unc.max()) <= 1.0

    # fast default path (what the driver runs): sharded step + spatial check
    ge.dryrun_multichip(8)


@pytest.mark.slow
def test_dryrun_full_trainer():
    """Opt-in heavyweight path: the full 2-stage progressive trainer (scan
    epochs + sharded resume) under the mesh — ~25 min cold on 1 CPU core.
    Deselected by default (pyproject addopts); run with ``pytest -m slow``."""
    import __graft_entry__ as ge
    from ugpg_tpu.parallel.mesh import make_mesh

    ge._dryrun_full_trainer(
        make_mesh(n_data=4, n_model=2), 8, np.random.default_rng(0)
    )


# ---------------------------------------------------------------------------
# parallel.distributed (single-process unit coverage; multi-host behavior is
# arithmetic + jax.make_array_from_process_local_data, both testable here)
# ---------------------------------------------------------------------------


def test_distributed_initialize_noop_single_process(monkeypatch):
    from ugpg_tpu.parallel import distributed

    monkeypatch.delenv("UGPG_COORDINATOR_ADDRESS", raising=False)
    # no coordinator configured -> returns without touching jax.distributed
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw), raising=True,
    )
    distributed.initialize()
    assert called == []
    assert distributed.is_multi_host() is False


def test_distributed_initialize_forwards_args(monkeypatch):
    from ugpg_tpu.parallel import distributed

    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw), raising=True,
    )
    distributed.initialize("10.0.0.1:1234", num_processes=4, process_id=2)
    assert called == [{
        "coordinator_address": "10.0.0.1:1234",
        "num_processes": 4,
        "process_id": 2,
    }]


def test_distributed_initialize_env_fallback(monkeypatch):
    from ugpg_tpu.parallel import distributed

    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw), raising=True,
    )
    monkeypatch.setenv("UGPG_COORDINATOR_ADDRESS", "h0:9999")
    distributed.initialize()
    assert called and called[0]["coordinator_address"] == "h0:9999"


def test_host_batch_slice_arithmetic(monkeypatch):
    from ugpg_tpu.parallel import distributed

    # single-process reality
    assert distributed.host_batch_slice(32) == slice(0, 32)
    # simulated 4-process layout
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        s = distributed.host_batch_slice(32)
        assert s == slice(pid * 8, pid * 8 + 8)
    # indivisible batch must raise, not silently drop the tail samples
    with pytest.raises(ValueError, match="not divisible"):
        distributed.host_batch_slice(10)


def test_initialize_guard_does_not_touch_backend(monkeypatch):
    """The already-initialized check must not call process_count()/devices()
    — those initialize the XLA backend, after which
    jax.distributed.initialize raises unconditionally (the bug this guards
    against bricked every real multi-host start)."""
    from ugpg_tpu.parallel import distributed

    def boom():
        raise AssertionError("initialize() touched the XLA backend")

    monkeypatch.setattr(jax, "process_count", boom)
    monkeypatch.setattr(jax, "devices", boom)
    called = []
    monkeypatch.setattr(
        jax.distributed, "initialize",
        lambda **kw: called.append(kw), raising=True,
    )
    distributed.initialize("10.0.0.2:5555", num_processes=2, process_id=0)
    assert called and called[0]["coordinator_address"] == "10.0.0.2:5555"

    # and when the cluster IS already up, it is a no-op
    from jax._src.distributed import global_state

    monkeypatch.setattr(global_state, "client", object(), raising=False)
    called.clear()
    distributed.initialize("10.0.0.2:5555")
    assert called == []


def test_global_batch_assembles_on_fake_mesh():
    from ugpg_tpu.parallel import distributed
    from ugpg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(n_data=4, n_model=2)
    imgs = np.arange(8 * 4 * 4 * 3, dtype=np.float32).reshape(8, 4, 4, 3)
    masks = (imgs[..., :1] > imgs.mean()).astype(np.float32)
    g_imgs, g_masks = distributed.global_batch((imgs, masks), mesh)
    assert g_imgs.shape == imgs.shape and g_masks.shape == masks.shape
    np.testing.assert_array_equal(np.asarray(g_imgs), imgs)
    np.testing.assert_array_equal(np.asarray(g_masks), masks)
    # batch axis is sharded over the data axis of the mesh
    assert len(g_imgs.addressable_shards) == 8  # 4 data x 2 model replicas
    shard0 = g_imgs.addressable_shards[0]
    assert shard0.data.shape[0] == imgs.shape[0] // 4


# ---------------------------------------------------------------------------
# trainer-level mesh integration: full progressive loop on the fake 8-device
# mesh must reproduce single-device metrics (GSPMD global-batch semantics)
# ---------------------------------------------------------------------------


@pytest.mark.slow
def test_seg_trainer_progressive_on_mesh_matches_single_device(tmp_path):
    from ugpg_tpu.data.synthetic import disk_dataset
    from ugpg_tpu.parallel.mesh import make_mesh
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {
        1: {"resolution": 32, "epochs_per_stage": 2, "lr": 3e-4},
        2: {"resolution": 64, "epochs_per_stage": 2, "lr": 1e-4},
    }
    imgs, masks = disk_dataset(num_samples=8, image_size=64, seed=5)
    batches = [(imgs, masks)]

    hists = {}
    for name, mesh in (
        ("single", None),
        ("mesh", make_mesh(n_data=4, n_model=2)),
    ):
        tr = UncertaintyGuidedProgressiveTrainer(
            stage_configs=cfgs, seed=3, verbose=False, mesh=mesh
        )
        hists[name] = dict(tr.train_progressive(
            batches, batches, stages=[1, 2], save_dir=str(tmp_path / name)
        ))

    # rtol 2%: RMSprop's early near-sign-descent updates amplify GSPMD
    # reduction-order fp differences (same chaos as in test_reference_parity)
    for key in ("train_loss", "val_loss", "train_dice", "val_dice",
                "uncertainty_weights_mean"):
        np.testing.assert_allclose(
            hists["single"][key], hists["mesh"][key], rtol=2e-2, atol=2e-2,
        ), key


def test_cls_trainer_epoch_on_mesh_matches_single_device():
    from ugpg_tpu.parallel.mesh import make_mesh
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    cfg = create_config()
    cfg.update(num_classes=3, epochs_per_stage=1, stages=[1],
               verbose=False, augment=False)
    g = np.random.default_rng(7)
    lab = g.integers(0, 3, 8).astype(np.int64)
    img = np.clip(g.random((8, 32, 32, 3), np.float32)
                  + 0.2 * lab[:, None, None, None], 0, 1).astype(np.float32)
    batches = [(img, lab)]

    results = {}
    for name, mesh in (("single", None), ("mesh", make_mesh(n_data=2, n_model=2))):
        tr = HerlevTrainer(cfg, seed=1, mesh=mesh)
        tr.setup_optimizer_scheduler(1)
        results[name] = tr.train_epoch(batches, 1)

    np.testing.assert_allclose(results["single"][0], results["mesh"][0],
                               rtol=2e-3)  # final_loss
    np.testing.assert_allclose(results["single"][1], results["mesh"][1],
                               rtol=2e-3)  # base_loss
    assert results["single"][2] == results["mesh"][2]  # accuracy


def test_fused_pallas_loss_under_mesh_matches_xla_loss():
    """fused_loss=True composes with mesh= (XLA resolves the Pallas custom
    call by replication — correct, if not data-parallel for that op)."""
    from ugpg_tpu.data.synthetic import disk_dataset
    from ugpg_tpu.parallel.mesh import make_mesh
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {1: {"resolution": 32, "epochs_per_stage": 1, "lr": 3e-4}}
    imgs, masks = disk_dataset(num_samples=8, image_size=32, seed=1)
    outs = {}
    for fused in (True, False):
        tr = UncertaintyGuidedProgressiveTrainer(
            stage_configs=cfgs, verbose=False,
            mesh=make_mesh(n_data=2, n_model=2), fused_loss=fused,
        )
        outs[fused] = tr.train_epoch([(imgs, masks)], 1)
    np.testing.assert_allclose(outs[True][0], outs[False][0], rtol=1e-5)
    np.testing.assert_allclose(outs[True][2], outs[False][2], rtol=1e-5)

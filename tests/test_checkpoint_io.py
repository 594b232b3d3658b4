"""Checkpoint IO edge cases + distributed helpers."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.io.checkpoint import (
    latest_checkpoint,
    load_checkpoint,
    save_checkpoint,
    sniff_stage,
)


def _vars(seed=0):
    g = np.random.default_rng(seed)
    return {
        "params": {"a": {"kernel": jnp.asarray(g.random((3, 4), np.float32))}},
        "batch_stats": {"a": {"mean": jnp.zeros(4)}},
    }


def test_roundtrip_with_templates(tmp_path):
    import optax

    from ugpg_tpu.train.optim import torch_adam

    v = _vars()
    tx = torch_adam(1e-3)
    opt_state = tx.init(v["params"])
    p = save_checkpoint(tmp_path / "c", v, opt_state=opt_state,
                        metadata={"stage": 2, "val_dice": 0.9})
    v2, opt2, meta = load_checkpoint(p, variables_template=_vars(1),
                                     opt_state_template=tx.init(v["params"]))
    np.testing.assert_array_equal(
        np.asarray(v["params"]["a"]["kernel"]),
        np.asarray(v2["params"]["a"]["kernel"]),
    )
    assert meta["stage"] == 2
    # optimizer state restored with matching structure
    assert jax.tree_util.tree_structure(opt2) == jax.tree_util.tree_structure(
        opt_state
    )


def test_templateless_load(tmp_path):
    p = save_checkpoint(tmp_path / "c", _vars(), metadata={"stage": 3})
    raw, opt, meta = load_checkpoint(p)
    assert opt is None
    assert raw["params"]["a"]["kernel"].shape == (3, 4)


def test_sniff_stage_default(tmp_path):
    p = save_checkpoint(tmp_path / "c", _vars(), metadata={})
    assert sniff_stage(p) == 4  # raw checkpoints assumed stage 4 (ref behavior)
    p2 = save_checkpoint(tmp_path / "d", _vars(), metadata={"stage": 2})
    assert sniff_stage(p2) == 2


def test_latest_checkpoint(tmp_path):
    import time

    assert latest_checkpoint(tmp_path) is None
    save_checkpoint(tmp_path / "stage1_best", _vars())
    time.sleep(0.01)
    save_checkpoint(tmp_path / "stage2_best", _vars())
    assert latest_checkpoint(tmp_path).name == "stage2_best"
    assert latest_checkpoint(tmp_path, prefix="stage1").name == "stage1_best"


def test_distributed_helpers_single_host():
    from ugpg_tpu.parallel.distributed import (
        host_batch_slice,
        initialize,
        is_multi_host,
    )

    initialize()  # no-op single process
    assert not is_multi_host()
    assert host_batch_slice(32) == slice(0, 32)


def test_global_batch_assembly():
    from ugpg_tpu.parallel.distributed import global_batch
    from ugpg_tpu.parallel.mesh import make_mesh

    mesh = make_mesh()
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    (gx,) = global_batch((x,), mesh)
    assert gx.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(gx), x)


def test_orbax_backend_roundtrip(tmp_path):
    """backend='orbax' writes PyTree storage the loader auto-detects; values
    and metadata schema match the msgpack backend exactly."""
    pytest.importorskip("orbax.checkpoint")
    import optax

    from ugpg_tpu.io.checkpoint import (
        has_checkpoint,
        latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
        sniff_stage,
    )
    from ugpg_tpu.models.pgunet import PGUNet1
    from ugpg_tpu.train.optim import torch_rmsprop

    module = PGUNet1(num_classes=1)
    v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    tx = torch_rmsprop(3e-4, weight_decay=1e-4)
    opt = tx.init(v["params"])

    path = save_checkpoint(tmp_path / "ckpts" / "orb", v, opt_state=opt,
                           metadata={"stage": 1, "val_dice": 0.5},
                           backend="orbax")
    assert has_checkpoint(path)
    assert not (path / "variables.msgpack").exists()
    assert sniff_stage(path) == 1
    assert latest_checkpoint(tmp_path / "ckpts").name == "orb"

    rv, ro, meta = load_checkpoint(path, variables_template=v,
                                   opt_state_template=opt)
    assert meta["val_dice"] == 0.5
    flat_a = jax.tree.leaves(v)
    flat_b = jax.tree.leaves(rv)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert jax.tree.structure(ro) == jax.tree.structure(opt)

    # overwrite works (matching the msgpack path's semantics)
    save_checkpoint(path, v, metadata={"stage": 1}, backend="orbax")


def test_orbax_checkpoint_loads_in_evaluator(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator
    from ugpg_tpu.io.checkpoint import save_checkpoint
    from ugpg_tpu.models.pgunet import PGUNet1

    module = PGUNet1(num_classes=1)
    v = module.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), False)
    path = save_checkpoint(tmp_path / "orb2", v, metadata={"stage": 1},
                           backend="orbax")
    ev = MoNuSegEvaluator(str(path))
    assert ev.stage == 1
    g = np.random.default_rng(0)
    mask, conf = ev.predict_image((g.random((40, 40, 3)) * 255).astype(np.uint8))
    assert mask.shape == (40, 40)


def test_save_checkpoint_rejects_unknown_backend(tmp_path):
    from ugpg_tpu.io.checkpoint import save_checkpoint

    with pytest.raises(ValueError, match="backend"):
        save_checkpoint(tmp_path / "x", {"params": {}}, backend="pickle")


def test_trainer_orbax_backend_end_to_end(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ugpg_tpu.data.synthetic import disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    cfgs = {1: {"resolution": 32, "epochs_per_stage": 1, "lr": 3e-4}}
    imgs, masks = disk_dataset(num_samples=4, image_size=32, seed=1)
    tr = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False, checkpoint_backend="orbax"
    )
    tr.train_progressive([(imgs, masks)], [(imgs, masks)], stages=[1],
                         save_dir=str(tmp_path))
    best = tmp_path / "ug_pgunet_stage1_best"
    assert (best / "variables_orbax").exists()
    # resume machinery finds orbax checkpoints too
    tr2 = UncertaintyGuidedProgressiveTrainer(
        stage_configs=cfgs, verbose=False
    )
    tr2.load_stage_weights(1, best)


def test_orbax_async_backend_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from ugpg_tpu.io.checkpoint import (
        load_checkpoint,
        save_checkpoint,
        wait_for_async_saves,
    )
    from ugpg_tpu.models.pgunet import PGUNet1

    module = PGUNet1(num_classes=1)
    v = module.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)), False)
    path = save_checkpoint(tmp_path / "async1", v, metadata={"stage": 1},
                           backend="orbax-async")
    # overwrite while a save may be in flight (waits internally)
    save_checkpoint(path, v, metadata={"stage": 1}, backend="orbax-async")
    wait_for_async_saves()
    rv, _, meta = load_checkpoint(path, variables_template=v)
    assert meta["stage"] == 1
    for a, b in zip(jax.tree.leaves(v), jax.tree.leaves(rv)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # load_checkpoint waits on in-flight saves by itself
    save_checkpoint(tmp_path / "async2", v, metadata={"stage": 1},
                    backend="orbax-async")
    rv2, _, _ = load_checkpoint(tmp_path / "async2", variables_template=v)
    assert jax.tree.structure(rv2) == jax.tree.structure(v)

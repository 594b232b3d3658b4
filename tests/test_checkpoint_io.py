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

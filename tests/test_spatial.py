"""Spatially-sharded (halo-exchange) inference == unsharded forward.

parallel/spatial.py runs a PGUNet stage with the image height sharded over a
mesh axis and 1-row halo exchanges (ppermute over ICI).  These tests assert
numeric equivalence against the plain ``PGUNetN.apply(..., train=False)`` on
the fake 8-device CPU mesh, including the whole-slide shapes the reference
cannot process at native resolution (it downsizes everything to <=256px,
ref: MoNuSegImprove/test_monuseg.py:164-201).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ugpg_tpu.models.pgunet import STAGE_MODELS
from ugpg_tpu.parallel.spatial import (
    make_spatial_infer,
    spatial_predict,
    spatial_stage_infer,
)


def _mesh(n: int, axis: str = "data") -> Mesh:
    return Mesh(np.asarray(jax.devices()[:n]), axis_names=(axis,))


def _init(stage: int, res: int, num_classes: int = 1):
    module = STAGE_MODELS[stage](num_classes=num_classes)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, res, res, 3)), False
    )
    return module, variables


def _perturbed(variables, rng):
    """Non-trivial BN stats so the eval path is actually exercised."""

    def bump(path, leaf):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return leaf + jnp.asarray(rng.standard_normal(leaf.shape) * 0.1)
        if name == "var":
            return leaf * jnp.asarray(1.0 + rng.random(leaf.shape) * 0.5)
        return leaf

    return jax.tree_util.tree_map_with_path(bump, variables)


@pytest.mark.parametrize("stage,res", [(1, 32), (2, 64), (3, 128), (4, 256)])
def test_spatial_matches_unsharded_all_stages(rng, stage, res):
    module, variables = _init(stage, res)
    variables = _perturbed(variables, rng)
    x = jnp.asarray(rng.standard_normal((2, res, res, 3), dtype=np.float32))
    want = np.asarray(module.apply(variables, x, False))
    for shards in (1, 2):
        got = np.asarray(
            spatial_stage_infer(variables, x, stage, _mesh(shards))
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spatial_8way_stage4(rng):
    module, variables = _init(4, 256)
    variables = _perturbed(variables, rng)
    x = jnp.asarray(rng.standard_normal((1, 512, 512, 3), dtype=np.float32))
    want = np.asarray(module.apply(variables, x, False))
    got = np.asarray(spatial_stage_infer(variables, x, 4, _mesh(8)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spatial_multiclass_heads(rng):
    module, variables = _init(3, 128, num_classes=3)
    x = jnp.asarray(rng.standard_normal((1, 128, 128, 3), dtype=np.float32))
    want = np.asarray(module.apply(variables, x, False))
    got = np.asarray(spatial_stage_infer(variables, x, 3, _mesh(4)))
    assert got.shape == (1, 128, 128, 3)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_spatial_predict_outputs(rng):
    _, variables = _init(4, 256)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 3), dtype=np.float32))
    preds, probs, unc = spatial_predict(variables, x, _mesh(4))
    preds, probs, unc = map(np.asarray, (preds, probs, unc))
    assert set(np.unique(preds)).issubset({0.0, 1.0})
    assert probs.min() >= 0.0 and probs.max() <= 1.0
    np.testing.assert_allclose(unc, 1.0 - 2.0 * np.abs(probs - 0.5), atol=1e-6)


def test_spatial_rejects_indivisible_height(rng):
    _, variables = _init(4, 256)
    x = jnp.zeros((1, 272, 272, 3))  # 272 not divisible by 4 shards * 16
    with pytest.raises(ValueError, match="divisible"):
        spatial_stage_infer(variables, x, 4, _mesh(4))


def test_spatial_bf16_path_close(rng):
    module, variables = _init(4, 256)
    x = jnp.asarray(rng.standard_normal((1, 256, 256, 3), dtype=np.float32))
    want = np.asarray(module.apply(variables, x, False))
    got = np.asarray(
        spatial_stage_infer(variables, x, 4, _mesh(4), dtype=jnp.bfloat16)
    )
    # bf16 compute path: loose tolerance, but must track the f32 forward
    np.testing.assert_allclose(got, want, rtol=0.15, atol=0.15)

"""BN folding: folded inference must match eval-mode BN inference exactly."""

import numpy as np

import jax
import jax.numpy as jnp

from ugpg_tpu.models.folding import fold_batchnorm
from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2


def _trained_like_variables(module, res, seed=0):
    """Init + perturb BN stats so folding is non-trivial."""
    v = module.init(jax.random.key(seed), jnp.zeros((1, res, res, 3)), False)
    g = np.random.default_rng(seed)

    def perturb(path, x):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "mean":
            return x + jnp.asarray(g.standard_normal(x.shape) * 0.3, x.dtype)
        if name == "var":
            return x * jnp.asarray(1.0 + 0.5 * g.random(x.shape), x.dtype)
        if name == "scale":
            return x * jnp.asarray(1.0 + 0.2 * g.random(x.shape), x.dtype)
        return x

    return jax.tree_util.tree_map_with_path(perturb, v)


def test_fold_matches_bn_stage1(rng):
    m = PGUNet1(num_classes=1)
    v = _trained_like_variables(m, 32)
    folded = fold_batchnorm(v)
    # no BN entries remain
    assert "bn1" not in folded["params"]["inc"]["conv"]
    m_folded = PGUNet1(num_classes=1, use_bn=False)
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    want = np.asarray(m.apply(v, x, False))
    got = np.asarray(m_folded.apply(folded, x, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_fold_matches_bn_stage2(rng):
    m = PGUNet2(num_classes=1)
    v = _trained_like_variables(m, 64, seed=1)
    folded = fold_batchnorm(v)
    m_folded = PGUNet2(num_classes=1, use_bn=False)
    x = jnp.asarray(rng.random((1, 64, 64, 3)).astype(np.float32))
    want = np.asarray(m.apply(v, x, False))
    got = np.asarray(m_folded.apply(folded, x, False))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_folded_param_count_shrinks():
    m = PGUNet1(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    folded = fold_batchnorm(v)
    n_before = sum(x.size for x in jax.tree_util.tree_leaves(v["params"]))
    n_after = sum(x.size for x in jax.tree_util.tree_leaves(folded["params"]))
    assert n_after < n_before
    assert "batch_stats" not in folded

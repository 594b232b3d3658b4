"""Exact-value tests for the uncertainty machinery (SURVEY.md §2c)."""

import numpy as np

import jax
import jax.numpy as jnp

from ugpg_tpu.ops.losses import bce_with_logits
from ugpg_tpu.uncertainty import (
    apply_uncertainty_weighted_loss,
    binary_uncertainty,
    classification_uncertainty_weights,
    entropy_uncertainty,
    generate_uncertainty_map,
)


def test_binary_uncertainty_exact_values():
    p = jnp.asarray([0.0, 0.25, 0.5, 0.75, 1.0])
    np.testing.assert_allclose(
        np.asarray(binary_uncertainty(p)), [0.0, 0.5, 1.0, 0.5, 0.0], atol=1e-7
    )


def test_binary_uncertainty_range(rng):
    p = jnp.asarray(rng.random((4, 8, 8, 1)).astype(np.float32))
    a = np.asarray(binary_uncertainty(p))
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_entropy_uncertainty_uniform_is_one():
    k = 7
    p = jnp.full((2, k), 1.0 / k)
    u = np.asarray(entropy_uncertainty(p, k))
    np.testing.assert_allclose(u, 1.0, atol=1e-4)


def test_entropy_uncertainty_onehot_is_zero():
    p = jnp.asarray([[1.0, 0.0, 0.0, 0.0]])
    u = np.asarray(entropy_uncertainty(p, 4))
    np.testing.assert_allclose(u, 0.0, atol=1e-4)


def test_weighted_loss_stage1_plain_mean(rng):
    pl = jnp.asarray(rng.random((2, 4, 4, 1)).astype(np.float32))
    final, base = apply_uncertainty_weighted_loss(pl, None, alpha=1.0)
    np.testing.assert_allclose(float(final), float(jnp.mean(pl)), rtol=1e-6)
    np.testing.assert_allclose(float(final), float(base), rtol=1e-6)


def test_weighted_loss_formula(rng):
    pl = jnp.asarray(rng.random((2, 4, 4, 1)).astype(np.float32))
    a = jnp.asarray(rng.random((2, 4, 4, 1)).astype(np.float32))
    alpha = 2.0
    final, base = apply_uncertainty_weighted_loss(pl, a, alpha=alpha)
    want = float(jnp.mean(pl * (1.0 + alpha * a)))
    np.testing.assert_allclose(float(final), want, rtol=1e-6)
    np.testing.assert_allclose(float(base), float(jnp.mean(pl)), rtol=1e-6)


def test_alpha_sweep_monotone(rng):
    """Reproduces the demo's alpha-impact table: loss grows with alpha
    (ref: demo_uncertainty_guided.py:155-201)."""
    pl = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32)) + 0.1
    a = jnp.asarray(rng.random((2, 8, 8, 1)).astype(np.float32))
    losses = [
        float(apply_uncertainty_weighted_loss(pl, a, alpha)[0])
        for alpha in [0.0, 0.5, 1.0, 2.0, 5.0]
    ]
    assert all(l2 > l1 for l1, l2 in zip(losses, losses[1:]))
    # alpha=0 equals plain mean
    np.testing.assert_allclose(losses[0], float(jnp.mean(pl)), rtol=1e-6)


def test_weights_are_stop_gradiented(rng):
    """Gradient must flow through pixel_loss only, not the uncertainty map."""
    logits = jnp.asarray(rng.standard_normal((1, 4, 4, 1)).astype(np.float32))
    target = jnp.ones((1, 4, 4, 1), jnp.float32)
    amap = jnp.asarray(rng.random((1, 4, 4, 1)).astype(np.float32))

    def loss_fn(lg):
        pl = bce_with_logits(lg, target, pos_weight=5.0)
        final, _ = apply_uncertainty_weighted_loss(pl, amap, 1.0)
        return final

    g = jax.grad(loss_fn)(logits)
    # weight map w = 1 + a; grad = dpl/dlogits * w / N
    pl_grad = jax.grad(lambda lg: jnp.mean(bce_with_logits(lg, target, 5.0)))(logits)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(pl_grad * (1.0 + amap)), rtol=1e-5
    )


def test_generate_uncertainty_map_shapes_and_range(rng):
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))

    def fake_prev(xp):
        assert xp.shape == (2, 32, 32, 3)
        return xp[..., :1] * 4.0 - 2.0  # logits

    a = generate_uncertainty_map(fake_prev, x, 32, 64)
    assert a.shape == (2, 64, 64, 1)
    a = np.asarray(a)
    assert a.min() >= 0.0 and a.max() <= 1.0


def test_classification_weights_multiclass(rng):
    logits = jnp.asarray(rng.standard_normal((8, 7)).astype(np.float32))
    w = np.asarray(classification_uncertainty_weights(logits, 7, alpha=1.0))
    assert w.shape == (8,)
    assert np.all(w >= 1.0) and np.all(w <= 2.0 + 1e-5)


def test_classification_weights_uniform_logits_max():
    logits = jnp.zeros((3, 7))
    w = np.asarray(classification_uncertainty_weights(logits, 7, alpha=1.0))
    np.testing.assert_allclose(w, 2.0, atol=1e-4)


def test_uncertainty_guided_loss_class_facade(rng):
    """Reference-API class facade (ref: UG_unet.py:8-94)."""
    from ugpg_tpu import UncertaintyGuidedLoss, create_uncertainty_weighted_loss_fn

    ugl = UncertaintyGuidedLoss(device="tpu")  # device accepted, ignored
    x = jnp.asarray(rng.random((2, 64, 64, 3)).astype(np.float32))

    def prev_apply(xp):
        return xp[..., :1] * 2 - 1

    amap = ugl.generate_uncertainty_map(x, prev_apply, 32, 64)
    assert amap.shape == (2, 64, 64, 1)

    loss_fn = create_uncertainty_weighted_loss_fn(pos_weight=5.0)
    out = jnp.asarray(rng.standard_normal((2, 64, 64, 1)).astype(np.float32))
    tgt = (jnp.asarray(rng.random((2, 64, 64, 1))) > 0.5).astype(jnp.float32)
    final, base = ugl.apply_uncertainty_weighted_loss(loss_fn, out, tgt, amap, 1.0)
    assert float(final) >= float(base)
    final1, base1 = ugl.apply_uncertainty_weighted_loss(loss_fn, out, tgt, None)
    np.testing.assert_allclose(float(final1), float(base1))


def test_facade_accepts_readme_task_type_kwarg():
    """README-style ctor (ref: README.md:52) and code-style ctor both work."""
    import pytest

    from ugpg_tpu.uncertainty import UncertaintyGuidedLoss

    a = UncertaintyGuidedLoss(task_type="segmentation")
    b = UncertaintyGuidedLoss("cuda")  # device string accepted and ignored
    assert a.task_type == "segmentation" and b.device == "cuda"
    with pytest.raises(ValueError, match="task_type"):
        UncertaintyGuidedLoss(task_type="detection")


def test_mc_dropout_uncertainty_classification():
    """MC-dropout variance: >0 under active dropout, 0 when rates are 0;
    mean probs normalized."""
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.models.classifier import HerlevClassificationModel
    from ugpg_tpu.uncertainty import mc_dropout_uncertainty

    g = np.random.default_rng(0)
    x = jnp.asarray(g.random((3, 32, 32, 3)).astype(np.float32))

    m = HerlevClassificationModel(stage=1, num_classes=5)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)

    def apply_fn(xx, rngs):
        # train=True activates dropout; BN uses batch stats here, which is
        # fine for the test (standard MC setups freeze BN; both are valid)
        return m.apply(v, xx, True, rngs=rngs, mutable=["batch_stats"])[0]

    mean, var = mc_dropout_uncertainty(
        apply_fn, x, jax.random.key(1), num_samples=6,
        task_type="classification",
    )
    assert mean.shape == (3, 5) and var.shape == (3,)
    np.testing.assert_allclose(np.asarray(mean).sum(-1), 1.0, rtol=1e-5)
    assert float(jnp.max(var)) > 0.0

    m0 = HerlevClassificationModel(stage=1, num_classes=5,
                                   dropout_rates=(0.0, 0.0, 0.0))
    v0 = m0.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)

    def apply0(xx, rngs):
        return m0.apply(v0, xx, True, rngs=rngs, mutable=["batch_stats"])[0]

    _, var0 = mc_dropout_uncertainty(apply0, x, jax.random.key(1),
                                     num_samples=4, task_type="classification")
    np.testing.assert_allclose(np.asarray(var0), 0.0, atol=1e-12)


def test_mc_dropout_uncertainty_segmentation_shapes():
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.uncertainty import mc_dropout_uncertainty

    def apply_fn(xx, rngs):
        noise = jax.random.normal(rngs["dropout"], xx.shape[:3] + (1,))
        return xx.mean(-1, keepdims=True) + 0.1 * noise

    x = jnp.ones((2, 8, 8, 3))
    mean, var = mc_dropout_uncertainty(apply_fn, x, jax.random.key(0),
                                       num_samples=5)
    assert mean.shape == (2, 8, 8, 1) and var.shape == (2, 8, 8, 1)
    assert 0.0 <= float(mean.min()) and float(mean.max()) <= 1.0
    assert float(var.max()) > 0.0

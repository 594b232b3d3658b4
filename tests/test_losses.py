"""Loss parity vs torch: BCEWithLogits(pos_weight) and weighted CE."""

import numpy as np
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ugpg_tpu.ops.losses import (
    bce_with_logits,
    softmax_cross_entropy,
    weighted_cross_entropy_mean,
)


def test_bce_with_logits_matches_torch(rng):
    x = rng.standard_normal((4, 16, 16, 1), dtype=np.float32) * 5
    z = (rng.random((4, 16, 16, 1)) > 0.5).astype(np.float32)
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(z), pos_weight=5.0))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x),
        torch.from_numpy(z),
        pos_weight=torch.tensor([5.0]),
        reduction="none",
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_bce_no_pos_weight(rng):
    x = rng.standard_normal((8, 8), dtype=np.float32) * 10
    z = (rng.random((8, 8)) > 0.3).astype(np.float32)
    got = np.asarray(bce_with_logits(jnp.asarray(x), jnp.asarray(z)))
    want = F.binary_cross_entropy_with_logits(
        torch.from_numpy(x), torch.from_numpy(z), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_bce_extreme_logits_stable():
    x = jnp.asarray([[-100.0, 100.0, 0.0]])
    z = jnp.asarray([[1.0, 0.0, 1.0]])
    out = np.asarray(bce_with_logits(x, z, pos_weight=5.0))
    assert np.all(np.isfinite(out))


def test_softmax_ce_matches_torch(rng):
    x = rng.standard_normal((16, 7), dtype=np.float32) * 3
    y = rng.integers(0, 7, size=16)
    got = np.asarray(softmax_cross_entropy(jnp.asarray(x), jnp.asarray(y)))
    want = F.cross_entropy(
        torch.from_numpy(x), torch.from_numpy(y), reduction="none"
    ).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_weighted_ce_mean_matches_torch(rng):
    """torch's weighted mean divides by sum of selected class weights."""
    x = rng.standard_normal((32, 7), dtype=np.float32)
    y = rng.integers(0, 7, size=32)
    w = rng.random(7).astype(np.float32) + 0.5
    got = float(
        weighted_cross_entropy_mean(jnp.asarray(x), jnp.asarray(y), jnp.asarray(w))
    )
    want = float(
        F.cross_entropy(torch.from_numpy(x), torch.from_numpy(y), weight=torch.from_numpy(w))
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=5e-4)


def test_binary_eval_metrics_empty_mask_scores_one():
    """Reference eps-in-numerator semantics (test_monuseg.py:283-288):
    empty GT + empty prediction => all metrics ~1.0, not 0.0."""
    from ugpg_tpu.metrics.segmentation import binary_eval_metrics

    pred = jnp.zeros((1, 8, 8))
    tgt = jnp.zeros((1, 8, 8))
    m = binary_eval_metrics(pred, tgt)
    for k in ("iou", "dice", "accuracy", "precision", "recall", "specificity"):
        np.testing.assert_allclose(float(m[k][0]), 1.0, rtol=1e-5), k


def test_binary_eval_metrics_full_and_mixed_match_reference():
    from ugpg_tpu.metrics.segmentation import binary_eval_metrics

    # all-ones pred vs all-ones GT: perfect, but specificity = eps/eps = 1
    m = binary_eval_metrics(jnp.ones((1, 4, 4)), jnp.ones((1, 4, 4)))
    np.testing.assert_allclose(float(m["dice"][0]), 1.0, rtol=1e-5)
    np.testing.assert_allclose(float(m["specificity"][0]), 1.0, rtol=1e-5)

    # mixed case cross-checked against the reference formulas in numpy
    rs = np.random.default_rng(3)
    p = (rs.random((2, 16, 16)) > 0.5).astype(np.float32)
    t = (rs.random((2, 16, 16)) > 0.5).astype(np.float32)
    m = binary_eval_metrics(jnp.asarray(p), jnp.asarray(t))
    eps = 1e-8
    for i in range(2):
        pf, tf = p[i].ravel(), t[i].ravel()
        tp = float(np.sum(pf * tf))
        fp = float(np.sum(pf)) - tp
        fn = float(np.sum(tf)) - tp
        tn = len(pf) - tp - fp - fn
        np.testing.assert_allclose(float(m["iou"][i]), (tp + eps) / (tp + fp + fn + eps), rtol=1e-5)
        np.testing.assert_allclose(float(m["dice"][i]), (2 * tp + eps) / (2 * tp + fp + fn + eps), rtol=1e-5)
        np.testing.assert_allclose(float(m["precision"][i]), (tp + eps) / (tp + fp + eps), rtol=1e-5)
        np.testing.assert_allclose(float(m["recall"][i]), (tp + eps) / (tp + fn + eps), rtol=1e-5)
        np.testing.assert_allclose(float(m["specificity"][i]), (tn + eps) / (tn + fp + eps), rtol=1e-5)

"""Segmentation metrics as pure jittable functions.

Training-side monitoring metrics mirror the reference trainer
(ref: uncertainty_guided_trainer.py:90-123): smooth=1 Dice over per-sample
flattened masks, sigmoid>0.5 predictions, pixel accuracy.  Evaluation-side
metrics mirror the eval CLI (ref: MoNuSegImprove/test_monuseg.py:264-297):
per-sample IoU/Dice/accuracy/precision/recall/specificity from TP/FP/FN/TN
counts with eps=1e-8.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dice_coefficient",
    "get_predictions",
    "pixel_accuracy",
    "binary_eval_metrics",
]

EPS = 1e-8


def get_predictions(logits: jax.Array, threshold: float = 0.5) -> jax.Array:
    """sigmoid -> threshold -> {0,1} float (ref: trainer.get_predictions)."""
    return (jax.nn.sigmoid(logits) > threshold).astype(jnp.float32)


def dice_coefficient(pred: jax.Array, target: jax.Array, smooth: float = 1.0) -> jax.Array:
    """Batch-mean Dice with additive smoothing (ref: trainer.dice_coefficient).

    pred/target: (B, ...) binary arrays; flattened per sample.
    """
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    inter = jnp.sum(p * t, axis=1)
    dice = (2.0 * inter + smooth) / (jnp.sum(p, axis=1) + jnp.sum(t, axis=1) + smooth)
    return jnp.mean(dice)


def pixel_accuracy(pred: jax.Array, target: jax.Array) -> jax.Array:
    """1 - error rate over all pixels (ref: trainer.calculate_accuracy)."""
    return jnp.mean((pred == target).astype(jnp.float32))


def binary_eval_metrics(pred: jax.Array, target: jax.Array) -> dict[str, jax.Array]:
    """Per-sample eval metrics, shape (B,) each (ref: test_monuseg.py:264-297).

    pred/target: (B, H, W) (or broadcastable) binary arrays.
    """
    b = pred.shape[0]
    p = pred.reshape(b, -1).astype(jnp.float32)
    t = target.reshape(b, -1).astype(jnp.float32)
    tp = jnp.sum(p * t, axis=1)
    fp = jnp.sum(p * (1 - t), axis=1)
    fn = jnp.sum((1 - p) * t, axis=1)
    tn = jnp.sum((1 - p) * (1 - t), axis=1)
    # eps in numerators too, matching the reference exactly
    # (ref: test_monuseg.py:283-288): empty GT + empty prediction scores 1.0.
    return {
        "iou": (tp + EPS) / (tp + fp + fn + EPS),
        "dice": (2 * tp + EPS) / (2 * tp + fp + fn + EPS),
        "accuracy": (tp + tn + EPS) / (tp + tn + fp + fn + EPS),
        "precision": (tp + EPS) / (tp + fp + EPS),
        "recall": (tp + EPS) / (tp + fn + EPS),
        "specificity": (tn + EPS) / (tn + fp + EPS),
    }

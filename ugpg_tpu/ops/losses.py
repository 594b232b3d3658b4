"""Loss primitives with exact PyTorch semantics, as pure jittable functions.

Parity targets:
* ``nn.BCEWithLogitsLoss(pos_weight=..., reduction='none')``
  (ref: uncertainty_guided_trainer.py:64-65)
* ``nn.CrossEntropyLoss(weight=...)`` — note torch's weighted *mean* divides
  by the sum of selected class weights, not the batch size
  (ref: Herlev/train_herlev.py:170-176)
* ``F.cross_entropy(..., reduction='none')``
  (ref: Herlev/train_herlev.py:279)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "bce_with_logits",
    "softmax_cross_entropy",
    "weighted_cross_entropy_mean",
]


def bce_with_logits(
    logits: jax.Array,
    targets: jax.Array,
    pos_weight: jax.Array | float | None = None,
) -> jax.Array:
    """Per-element binary cross entropy from logits (reduction='none').

    ``l = (1 - z) * x + (1 + (pw - 1) * z) * softplus(-x)`` — the numerically
    stable rearrangement of ``-[pw*z*log(sig(x)) + (1-z)*log(1-sig(x))]``.
    """
    x = logits.astype(jnp.float32)
    z = targets.astype(jnp.float32)
    sp = jax.nn.softplus(-x)
    if pos_weight is None:
        return (1.0 - z) * x + sp
    pw = jnp.asarray(pos_weight, dtype=jnp.float32)
    return (1.0 - z) * x + (1.0 + (pw - 1.0) * z) * sp


def softmax_cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-sample CE from logits (B, K) and integer labels (B,)."""
    logz = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logz, labels[:, None].astype(jnp.int32), axis=-1)[:, 0]


def weighted_cross_entropy_mean(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: jax.Array | None = None,
) -> jax.Array:
    """torch ``CrossEntropyLoss(weight=w)`` scalar: sum(w_y*ce) / sum(w_y)."""
    ce = softmax_cross_entropy(logits, labels)
    if class_weights is None:
        return jnp.mean(ce)
    w = jnp.take(jnp.asarray(class_weights, dtype=jnp.float32), labels)
    return jnp.sum(w * ce) / jnp.sum(w)

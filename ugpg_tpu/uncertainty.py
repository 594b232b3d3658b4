"""Uncertainty-guided loss machinery as pure jittable functions.

The heart of the method (ref: UG_unet.py:8-94).  Everything here is a pure
function of arrays so the whole chain — resize to prev resolution, frozen
prev-stage forward, resize probabilities back up, pointwise uncertainty map,
weighted-loss reduction — compiles into ONE fused XLA program inside the
train step.  ``stop_gradient`` replaces torch's ``no_grad``/``detach``
(ref: UG_unet.py:34,59,89).

Formulas:
* binary uncertainty   A = 1 - 2*|P - 0.5|           (ref: UG_unet.py:57)
* weight map           w = 1 + alpha * A             (ref: UG_unet.py:86)
* entropy uncertainty  H(p)/log(K) for multi-class classification
  (ref: Herlev/train_herlev.py:254-257)
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ugpg_tpu.ops.resize import resize_bilinear_align_corners

__all__ = [
    "binary_uncertainty",
    "entropy_uncertainty",
    "mc_dropout_uncertainty",
    "generate_uncertainty_map",
    "apply_uncertainty_weighted_loss",
    "classification_uncertainty_weights",
]


def binary_uncertainty(probs: jax.Array) -> jax.Array:
    """A = 1 - 2*|P - 0.5|: 1 at P=0.5, 0 at P in {0,1} (ref: UG_unet.py:57)."""
    return 1.0 - 2.0 * jnp.abs(probs - 0.5)


def entropy_uncertainty(probs: jax.Array, num_classes: int, axis: int = -1) -> jax.Array:
    """Normalized softmax entropy H(p)/log(K) (ref: Herlev/train_herlev.py:256-257)."""
    entropy = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=axis, keepdims=True)
    return entropy / jnp.log(float(num_classes))


def mc_dropout_uncertainty(
    apply_fn: Callable[..., jax.Array],
    x: jax.Array,
    key: jax.Array,
    num_samples: int = 8,
    task_type: str = "segmentation",
) -> tuple[jax.Array, jax.Array]:
    """Monte-Carlo-dropout epistemic uncertainty (variance across stochastic
    forward passes) — an ADDITION over the reference's fixed pointwise
    formulas: the BASELINE.json north star names it as an alternative
    uncertainty source for the guidance maps.

    ``apply_fn(x, rngs={'dropout': k}) -> logits`` must run the model with
    dropout ACTIVE (train-mode dropout, eval-mode BN is the standard MC
    setup; the Herlev classifier's head has three dropout layers,
    ref: Herlev/train_herlev.py:66-77).  Vectorized over samples with
    ``vmap`` — one XLA program, no Python loop on the hot path.

    Returns (mean_probs, variance):
      * segmentation: sigmoid probs, per-pixel mean/variance (B, H, W, K)
      * classification: softmax probs, per-class mean and per-sample
        predictive variance (mean over classes), shapes (B, K) and (B,)
    """
    keys = jax.random.split(key, num_samples)

    def one(k):
        # f32 before the nonlinearity regardless of the model's compute
        # dtype: bf16 probabilities quantize at ~4e-3 near p=0.5, which
        # would inject spurious variance of the same order as small real
        # epistemic variances (the deterministic serving paths upcast too)
        logits = apply_fn(x, rngs={"dropout": k}).astype(jnp.float32)
        if task_type == "classification":
            return jax.nn.softmax(logits, axis=-1)
        return jax.nn.sigmoid(logits)

    probs = jax.vmap(one)(keys)  # (S, ...)
    mean = jnp.mean(probs, axis=0)
    var = jnp.var(probs, axis=0)
    if task_type == "classification":
        var = jnp.mean(var, axis=-1)
    return jax.lax.stop_gradient(mean), jax.lax.stop_gradient(var)


def generate_uncertainty_map(
    prev_apply: Callable[[jax.Array], jax.Array],
    x_current: jax.Array,
    prev_resolution: int,
    current_resolution: int,
) -> jax.Array:
    """Uncertainty map from the frozen previous-stage model.

    (a) bilinear-downsample input to prev resolution, (b) frozen forward +
    sigmoid, (c) bilinear-upsample probs back, (d) pointwise uncertainty.
    All under stop_gradient (ref: UG_unet.py:19-59).  ``prev_apply`` must run
    the prev model in eval mode (running BN stats).

    x_current: NHWC at current resolution. Returns NHWC (K channels).
    """
    x_prev = resize_bilinear_align_corners(
        x_current, (prev_resolution, prev_resolution)
    )
    probs = jax.nn.sigmoid(prev_apply(x_prev))
    probs_up = resize_bilinear_align_corners(
        probs, (current_resolution, current_resolution)
    )
    return jax.lax.stop_gradient(binary_uncertainty(probs_up))


def apply_uncertainty_weighted_loss(
    pixel_loss: jax.Array,
    uncertainty_map: jax.Array | None,
    alpha: float = 1.0,
) -> tuple[jax.Array, jax.Array]:
    """Weighted mean of a per-pixel loss (ref: UG_unet.py:61-94).

    Stage 1 (``uncertainty_map is None``): plain mean.  Stage > 1:
    ``mean(pixel_loss * stop_gradient(1 + alpha*A))``.  Returns
    (final_loss, base_loss) where base_loss is the unweighted mean kept for
    monitoring.
    """
    base_loss = jnp.mean(pixel_loss)
    if uncertainty_map is None:
        return base_loss, base_loss
    weights = jax.lax.stop_gradient(1.0 + alpha * uncertainty_map)
    return jnp.mean(pixel_loss * weights), base_loss


def classification_uncertainty_weights(
    prev_logits: jax.Array,
    num_classes: int,
    alpha: float = 1.0,
) -> jax.Array:
    """Per-sample weights for classification (ref: Herlev/train_herlev.py:252-276).

    Multi-class (K > 2): normalized softmax entropy.  Binary: the
    1-2|p-0.5| formula on sigmoid probs.  Spatial maps are mean-pooled to a
    single scalar per sample; returns (B,) weights ``1 + alpha*A``.
    """
    if num_classes > 2:
        probs = jax.nn.softmax(prev_logits, axis=-1)
        unc = entropy_uncertainty(probs, num_classes, axis=-1)
    else:
        probs = jax.nn.sigmoid(prev_logits)
        unc = binary_uncertainty(probs)
    # Mean over all non-batch axes -> one scalar per sample.
    axes = tuple(range(1, unc.ndim))
    unc = jnp.mean(unc, axis=axes) if axes else unc
    return jax.lax.stop_gradient(1.0 + alpha * unc)


class UncertaintyGuidedLoss:
    """API-parity facade over the pure functions above.

    The reference's code exposes ``UncertaintyGuidedLoss(device)`` (ref:
    UG_unet.py:8-94) while its README documents
    ``UncertaintyGuidedLoss(task_type='segmentation')`` (ref: README.md:52);
    both call styles are accepted.  JAX needs no device handle — the
    argument is kept for drop-in compatibility.  Prefer the module-level
    functions in new code; they jit/fuse into the train step.
    """

    def __init__(self, device=None, task_type: str = "segmentation"):
        if task_type not in ("segmentation", "classification"):
            raise ValueError(f"unknown task_type: {task_type!r}")
        self.device = device
        self.task_type = task_type

    def generate_uncertainty_map(
        self, input_current, prev_apply, prev_resolution, current_resolution
    ):
        """``prev_apply``: callable running the frozen previous-stage model
        in eval mode (a bound ``module.apply`` closure replaces the torch
        module handle)."""
        return generate_uncertainty_map(
            prev_apply, input_current, prev_resolution, current_resolution
        )

    def apply_uncertainty_weighted_loss(
        self, loss_fn, output_current, target_current,
        uncertainty_map=None, alpha=1.0,
    ):
        """``loss_fn(outputs, targets) -> per-pixel loss`` (reduction-free),
        mirroring the reference's reduction='none' contract.  Returns
        (final_loss, base_loss) like the reference (base as a traceable
        scalar rather than a Python float — call ``float()`` to match)."""
        pixel_loss = loss_fn(output_current, target_current)
        return apply_uncertainty_weighted_loss(pixel_loss, uncertainty_map, alpha)


def create_uncertainty_weighted_loss_fn(base_loss_fn=None, pos_weight=None):
    """Reduction-free BCE factory (ref: UG_unet.py:107-129).

    The reference rebuilds a torch loss with reduction='none'; here losses
    are already pure per-element functions, so this returns a closure over
    ``bce_with_logits`` with the given pos_weight (or passes through a
    user-provided per-element loss_fn unchanged).
    """
    if base_loss_fn is not None:
        return base_loss_fn
    from ugpg_tpu.ops.losses import bce_with_logits

    def loss_fn(outputs, targets):
        return bce_with_logits(outputs, targets, pos_weight)

    return loss_fn

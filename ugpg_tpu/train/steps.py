"""Fused jit train/eval steps: the TPU-native core of the method.

The reference runs, per batch: host->device copy, two F.interpolate resizes,
the current-model forward, a *second* full forward through the frozen
previous model (uncertainty), pointwise loss weighting, backward, optimizer
step, then several ``.item()`` device syncs for metrics (ref call stack:
SURVEY.md §3.1).  Here the entire chain is ONE compiled XLA program per
(stage, task):

    resize(img bilinear-ac, mask nearest) -> prev-model fwd (stop_grad)
    -> uncertainty map -> current fwd (BN batch_stats threaded)
    -> weighted BCE -> grads -> torch-RMSprop update -> on-device metrics

No host syncs inside the loop; metrics come back as a small dict of scalars
the host reads asynchronously.  ``donate_argnums`` recycles the parameter /
optimizer buffers in place (HBM-friendly).

One jitted step exists per (stage, resolution) pair — shape polymorphism is
handled by compile-cache keys, not dynamic shapes (SURVEY §7 hard-part #4).
"""

from __future__ import annotations

from functools import lru_cache, partial
from typing import Any, Callable, Mapping

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from ugpg_tpu.metrics.segmentation import dice_coefficient, get_predictions, pixel_accuracy
from ugpg_tpu.ops.losses import bce_with_logits, softmax_cross_entropy, weighted_cross_entropy_mean
from ugpg_tpu.data.augment import (
    augment_herlev_batch,
    augment_monuseg_batch,
    imagenet_normalize,
)
from ugpg_tpu.ops.resize import resize_bilinear_align_corners, resize_nearest
from ugpg_tpu.ops.pallas.uncertainty_fused import uncertainty_weighted_bce
from ugpg_tpu.uncertainty import (
    apply_uncertainty_weighted_loss,
    binary_uncertainty,
    classification_uncertainty_weights,
    generate_uncertainty_map,
)

__all__ = ["TrainState", "make_seg_train_step", "make_seg_eval_step",
           "make_cls_train_step", "make_cls_eval_step",
           "make_seg_train_epoch", "make_seg_eval_epoch",
           "make_cls_train_epoch", "make_cls_eval_epoch",
           "split_epoch_keys", "stack_epoch", "scan_usable", "put_stacked"]


@lru_cache(maxsize=128)
def _jitted_opt_init(init_fn):
    return jax.jit(init_fn)


class TrainState(struct.PyTreeNode):
    """Immutable training state (params + BN stats + optimizer state)."""

    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    @property
    def variables(self) -> dict:
        return {"params": self.params, "batch_stats": self.batch_stats}

    @classmethod
    def create(cls, variables: Mapping[str, Any], tx: optax.GradientTransformation):
        # jit the optimizer init: eager per-leaf zeros_like would dispatch
        # one device op per parameter (hundreds of round trips on a remote
        # backend); one compiled call materializes the whole state.  The
        # jitted wrapper is memoized per tx.init so repeated stage entries
        # (and fresh trainer instances sharing memoized optimizers, see
        # train/optim.py) reuse the compiled program instead of re-tracing.
        return cls(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=_jitted_opt_init(tx.init)(variables["params"]),
            step=jnp.zeros((), jnp.int32),
        )


def _unc_stats(weights_or_map, is_stage1: bool):
    if is_stage1:
        z = jnp.zeros((), jnp.float32)
        return z, z
    return jnp.mean(weights_or_map), jnp.std(weights_or_map)


def make_seg_train_step(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    donate: bool = True,
    augment: bool = False,
    fused_loss: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
    aug_quantize: int = 0,
) -> Callable:
    """Build the jitted segmentation train step for one stage.

    Returns ``step(state, prev_variables, batch, pos_weight, rng) ->
    (state, metrics)`` where ``batch = (images NHWC, masks NHW1)`` at any
    input resolution (resized in-graph), ``prev_variables`` is the frozen
    previous-stage variable tree ({} for stage 1) and ``pos_weight`` is a
    scalar array (dynamic: AugMoNuSeg recomputes it from data without
    recompiling, ref: train_aug_monuseg.py:94-121).  With ``augment=True``
    the fused on-device MoNuSeg augmentation (flips/rotation/color jitter)
    runs inside the same XLA program, keyed by ``rng``.  With
    ``fused_loss=True`` the loss + its VJP run as Pallas kernels
    (single-pass HBM reduction, no per-pixel loss tensor kept for the
    backward; see ops/pallas/uncertainty_fused.py).

    ``external_uncertainty=True`` removes the frozen prev-model forward
    from the program: the ``prev_variables`` slot instead carries the
    PRE-COMPUTED upsampled previous-stage probabilities ``probs_up``
    (B, resolution, resolution, K) — produced by a separate program,
    typically on a disjoint device group (pipeline parallelism, see
    parallel/pipeline.py).  The uncertainty map is derived from it
    in-graph (pointwise, stop-gradient); everything else is identical.

    ``accum_steps=K`` (gradient accumulation): the batch (size K*m) runs
    as K sequential micro-batches inside ONE XLA program — activations
    live for m samples at a time, gradients average across the K
    micro-forwards, and the optimizer applies ONE update.  BatchNorm
    running stats thread sequentially through the micro-batches (torch
    semantics: K forwards, then step).  Use for effective batch sizes
    whose activations cannot fit HBM at once.
    """
    step = _build_seg_train_body(
        module, tx, stage, resolution, prev_module, prev_resolution,
        alpha, augment, fused_loss, accum_steps, external_uncertainty,
        aug_quantize=aug_quantize,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _accum_scan(micro, params, batch_stats, arrays, rng, accum_steps,
                metric_sums=()):
    """Run ``micro`` over K equal micro-batches, averaging grads/metrics.

    ``micro(params, batch_stats, *micro_arrays, key) -> (grads, new_bs,
    metrics)``; each array in ``arrays`` splits on its leading axis.
    ``rng=None`` skips the key stream for deterministic micro-steps
    (``micro`` is then called without a trailing key).  Metric keys
    listed in ``metric_sums`` are summed instead of averaged (integer
    counts).
    """
    n = arrays[0].shape[0]
    if n % accum_steps:
        raise ValueError(
            f"batch size {n} is not divisible by accum_steps={accum_steps}"
        )
    m = n // accum_steps
    split = tuple(a.reshape(accum_steps, m, *a.shape[1:]) for a in arrays)
    keys = (jax.random.split(rng, accum_steps),) if rng is not None else ()

    def body(carry, xs):
        bs, gacc = carry
        grads, new_bs, metrics = micro(params, bs, *xs)
        gacc = jax.tree.map(jnp.add, gacc, grads)
        return (new_bs, gacc), metrics

    zero_g = jax.tree.map(jnp.zeros_like, params)
    (new_bs, gsum), ms = jax.lax.scan(
        body, (batch_stats, zero_g), (*split, *keys)
    )
    grads = jax.tree.map(lambda g: g / accum_steps, gsum)
    metrics = {
        k: jnp.sum(v, 0) if k in metric_sums else jnp.mean(v, 0)
        for k, v in ms.items()
    }
    return grads, new_bs, metrics


def _build_seg_train_body(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    augment: bool = False,
    fused_loss: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
    aug_quantize: int = 0,
) -> Callable:
    """Un-jitted seg train-step body, shared by the per-step jit and the
    ``lax.scan`` whole-epoch program (``make_seg_train_epoch``).

    ``aug_quantize=N`` (opt-in): run the augmentation rotation on the
    angle-quantized MXU shear path with N discrete angles (ops/rotate.py)
    instead of the per-sample gather — see BASELINE.md §train-roofline."""
    use_unc = stage > 1 and (prev_module is not None or external_uncertainty)
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def micro(params, batch_stats, prev_variables, images, masks,
              pos_weight, rng):
        """Grads + metrics for one (micro-)batch at fixed ``params``.

        ``prev_variables`` is the frozen previous-stage variable tree, or —
        with ``external_uncertainty`` — the precomputed ``probs_up`` array
        from the pipelined producer program (parallel/pipeline.py).
        """
        x = resize_bilinear_align_corners(images, (resolution, resolution))
        y = resize_nearest(masks, (resolution, resolution))
        if augment:
            x, y = augment_monuseg_batch(
                rng, x, y, quantize_angles=aug_quantize
            )

        if use_unc:
            if external_uncertainty:
                probs_up = jax.lax.stop_gradient(prev_variables)
            else:
                x_prev = resize_bilinear_align_corners(
                    x, (prev_resolution, prev_resolution)
                )
                probs_prev = jax.nn.sigmoid(
                    prev_module.apply(prev_variables, x_prev, False)
                )
                probs_up = jax.lax.stop_gradient(
                    resize_bilinear_align_corners(
                        probs_prev, (resolution, resolution)
                    )
                )
            unc_map = jax.lax.stop_gradient(binary_uncertainty(probs_up))
        else:
            probs_up = None
            unc_map = None

        def loss_fn(params):
            logits, mutated = module.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                True,
                mutable=["batch_stats"],
            )
            if fused_loss:
                p_arg = probs_up if use_unc else jnp.full_like(logits, 0.5)
                final_loss, base_loss = uncertainty_weighted_bce(
                    logits, y, p_arg, pos_weight, alpha if use_unc else 0.0
                )
            else:
                pixel_loss = bce_with_logits(logits, y, pos_weight)
                final_loss, base_loss = apply_uncertainty_weighted_loss(
                    pixel_loss, unc_map, alpha
                )
            return final_loss, (base_loss, logits, mutated["batch_stats"])

        (final_loss, (base_loss, logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)

        preds = get_predictions(logits)
        unc_mean, unc_std = _unc_stats(unc_map, not use_unc)
        metrics = {
            "final_loss": final_loss,
            "base_loss": base_loss,
            "dice": dice_coefficient(preds, y),
            "accuracy": pixel_accuracy(preds, y),
            "uncertainty_weight_mean": unc_mean,
            "uncertainty_weight_std": unc_std,
        }
        return grads, new_bs, metrics

    def step(state: TrainState, prev_variables, batch, pos_weight, rng):
        images, masks = batch
        if accum_steps == 1:
            grads, new_bs, metrics = micro(
                state.params, state.batch_stats, prev_variables,
                images, masks, pos_weight, rng,
            )
        elif external_uncertainty and use_unc:
            # the precomputed probs_up (B, res, res, K) splits into
            # micro-batches on its leading axis exactly like images/masks
            # (the producer program mirrors the per-micro augmentation
            # keying; see parallel/pipeline.py::make_uncertainty_program)
            grads, new_bs, metrics = _accum_scan(
                lambda p, bs, pu, im, ms, k: micro(
                    p, bs, pu, im, ms, pos_weight, k
                ),
                state.params, state.batch_stats,
                (prev_variables, images, masks), rng, accum_steps,
            )
        else:
            grads, new_bs, metrics = _accum_scan(
                lambda p, bs, im, ms, k: micro(
                    p, bs, prev_variables, im, ms, pos_weight, k
                ),
                state.params, state.batch_stats, (images, masks), rng,
                accum_steps,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    return step


def make_seg_eval_step(
    module,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
) -> Callable:
    """Jitted validation step: same losses/metrics, eval-mode BN, no update."""
    return jax.jit(
        _build_seg_eval_body(
            module, stage, resolution, prev_module, prev_resolution, alpha
        )
    )


def _build_seg_eval_body(
    module,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
) -> Callable:
    use_unc = stage > 1 and prev_module is not None

    def step(variables, prev_variables, batch, pos_weight):
        images, masks = batch
        x = resize_bilinear_align_corners(images, (resolution, resolution))
        y = resize_nearest(masks, (resolution, resolution))

        if use_unc:
            def prev_apply(xp):
                return prev_module.apply(prev_variables, xp, False)

            unc_map = generate_uncertainty_map(
                prev_apply, x, prev_resolution, resolution
            )
        else:
            unc_map = None

        logits = module.apply(variables, x, False)
        pixel_loss = bce_with_logits(logits, y, pos_weight)
        final_loss, base_loss = apply_uncertainty_weighted_loss(
            pixel_loss, unc_map, alpha
        )
        preds = get_predictions(logits)
        unc_mean, unc_std = _unc_stats(unc_map, not use_unc)
        return {
            "final_loss": final_loss,
            "base_loss": base_loss,
            "dice": dice_coefficient(preds, y),
            "accuracy": pixel_accuracy(preds, y),
            "uncertainty_weight_mean": unc_mean,
            "uncertainty_weight_std": unc_std,
        }

    return step


def make_cls_train_step(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    donate: bool = True,
    augment: bool = False,
    normalize: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
) -> Callable:
    """Classification train step (ref: Herlev/train_herlev.py:216-296).

    ``step(state, prev_variables, batch, class_weights, rng) ->
    (state, metrics)`` with ``batch = (images NHWC, labels (B,))``.
    Base loss is class-weighted CE (torch weighted-mean semantics); the
    uncertainty-weighted loss uses UNWEIGHTED per-sample CE, matching the
    reference exactly (ref: train_herlev.py:279 uses F.cross_entropy without
    class weights).

    With ``augment=True`` the on-device Herlev augmentation (flips /
    rotation / color jitter / affine) runs inside this XLA program, keyed by
    ``rng`` (which also drives dropout); with ``normalize=True`` the
    ImageNet normalization does too (ref dataset transform stack:
    herlev_dataset.py:200-228) — no separate host-dispatched programs.

    ``accum_steps=K``: gradient accumulation over K sequential
    micro-batches inside one program (see ``make_seg_train_step``).
    Note the class-weighted CE normalizes by sum(weight[y]) PER
    micro-batch — exactly what standard torch accumulation produces
    (``criterion(micro)/K`` with ``CrossEntropyLoss(weight=...,
    reduction='mean')``), which differs from one K*m-batch weighted mean
    when class composition varies across micro-batches.  The
    uncertainty-weighted loss (stage>1) is a plain mean and composes
    exactly.

    ``external_uncertainty=True``: the ``prev_variables`` slot instead
    carries PRE-COMPUTED per-sample uncertainty weights ``(B,)`` from the
    pipelined producer program (parallel/pipeline.py) and the frozen
    prev-model forward drops out of this program.
    """
    step = _build_cls_train_body(
        module, tx, stage, resolution, num_classes, prev_module,
        prev_resolution, alpha, augment, normalize, accum_steps,
        external_uncertainty,
    )
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _build_cls_train_body(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    augment: bool = False,
    normalize: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
) -> Callable:
    use_unc = stage > 1 and (prev_module is not None or external_uncertainty)
    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    def micro(params, batch_stats, prev_variables, images, labels,
              class_weights, rng):
        if augment:
            rng, akey = jax.random.split(rng)
            images = augment_herlev_batch(akey, images)
        if normalize:
            images = imagenet_normalize(images)
        x = resize_bilinear_align_corners(images, (resolution, resolution))

        if use_unc:
            if external_uncertainty:
                unc_weights = jax.lax.stop_gradient(prev_variables)
            else:
                x_prev = resize_bilinear_align_corners(
                    x, (prev_resolution, prev_resolution)
                )
                prev_logits = prev_module.apply(prev_variables, x_prev, False)
                unc_weights = classification_uncertainty_weights(
                    prev_logits, num_classes, alpha
                )
        else:
            unc_weights = None

        def loss_fn(params):
            logits, mutated = module.apply(
                {"params": params, "batch_stats": batch_stats},
                x,
                True,
                rngs={"dropout": rng},
                mutable=["batch_stats"],
            )
            base_loss = weighted_cross_entropy_mean(logits, labels, class_weights)
            if unc_weights is not None:
                per_sample = softmax_cross_entropy(logits, labels)
                final_loss = jnp.mean(per_sample * unc_weights)
            else:
                final_loss = base_loss
            return final_loss, (base_loss, logits, mutated["batch_stats"])

        (final_loss, (base_loss, logits, new_bs)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)

        correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        if unc_weights is not None:
            unc_mean, unc_std = jnp.mean(unc_weights), jnp.std(unc_weights)
        else:
            unc_mean = unc_std = jnp.zeros((), jnp.float32)
        metrics = {
            "final_loss": final_loss,
            "base_loss": base_loss,
            "correct": correct,
            "count": jnp.asarray(labels.shape[0], jnp.int32),
            "uncertainty_weight_mean": unc_mean,
            "uncertainty_weight_std": unc_std,
        }
        return grads, new_bs, metrics

    def step(state: TrainState, prev_variables, batch, class_weights, rng):
        images, labels = batch
        if accum_steps == 1:
            grads, new_bs, metrics = micro(
                state.params, state.batch_stats, prev_variables,
                images, labels, class_weights, rng,
            )
        elif external_uncertainty and use_unc:
            # the precomputed per-sample weights (B,) split into
            # micro-batches alongside images/labels (the producer mirrors
            # the per-micro rng keying; parallel/pipeline.py)
            grads, new_bs, metrics = _accum_scan(
                lambda p, bs, uw, im, lb, k: micro(
                    p, bs, uw, im, lb, class_weights, k
                ),
                state.params, state.batch_stats,
                (prev_variables, images, labels), rng,
                accum_steps, metric_sums=("correct", "count"),
            )
        else:
            grads, new_bs, metrics = _accum_scan(
                lambda p, bs, im, lb, k: micro(
                    p, bs, prev_variables, im, lb, class_weights, k
                ),
                state.params, state.batch_stats, (images, labels), rng,
                accum_steps, metric_sums=("correct", "count"),
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    return step


def make_cls_eval_step(
    module,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    normalize: bool = False,
) -> Callable:
    return jax.jit(
        _build_cls_eval_body(
            module, stage, resolution, num_classes, prev_module,
            prev_resolution, alpha, normalize,
        )
    )


def _build_cls_eval_body(
    module,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    normalize: bool = False,
) -> Callable:
    use_unc = stage > 1 and prev_module is not None

    def step(variables, prev_variables, batch, class_weights):
        images, labels = batch
        if normalize:
            images = imagenet_normalize(images)
        x = resize_bilinear_align_corners(images, (resolution, resolution))

        if use_unc:
            x_prev = resize_bilinear_align_corners(
                x, (prev_resolution, prev_resolution)
            )
            prev_logits = prev_module.apply(prev_variables, x_prev, False)
            unc_weights = classification_uncertainty_weights(
                prev_logits, num_classes, alpha
            )
        else:
            unc_weights = None

        logits = module.apply(variables, x, False)
        base_loss = weighted_cross_entropy_mean(logits, labels, class_weights)
        if unc_weights is not None:
            per_sample = softmax_cross_entropy(logits, labels)
            final_loss = jnp.mean(per_sample * unc_weights)
            unc_mean, unc_std = jnp.mean(unc_weights), jnp.std(unc_weights)
        else:
            final_loss = base_loss
            unc_mean = unc_std = jnp.zeros((), jnp.float32)
        correct = jnp.sum((jnp.argmax(logits, -1) == labels).astype(jnp.int32))
        return {
            "final_loss": final_loss,
            "base_loss": base_loss,
            "correct": correct,
            "count": jnp.asarray(labels.shape[0], jnp.int32),
            "uncertainty_weight_mean": unc_mean,
            "uncertainty_weight_std": unc_std,
            "logits": logits,
        }

    return step


# ----------------------------------------------------------------------
# Whole-epoch scan programs: S train/eval steps fused into ONE XLA call.
#
# Per-step dispatch costs one host->device program launch (and, on a
# remote/tunneled backend, a network round trip) per batch; at small batch
# compute this dominates wall time.  ``lax.scan`` over a stacked epoch
# ``(S, B, ...)`` compiles the step body ONCE and runs all S optimizer
# updates device-side — one dispatch and one metric fetch per epoch.  The
# bodies are byte-identical to the per-step jits (same builders), so the
# update trajectory matches the loop path exactly for the same RNG keys.


@partial(jax.jit, static_argnums=1)
def split_epoch_keys(key, n: int):
    """Iterate ``key, sub = jax.random.split(key)`` n times IN ONE PROGRAM.

    Returns ``(next_key, subs)`` with ``subs.shape == (n,)`` — the exact
    subkey sequence the per-step training loop draws, so scan-mode epochs
    reproduce loop-mode trajectories bit-for-bit (augmentation + dropout).
    """

    def body(k, _):
        k, sub = jax.random.split(k)
        return k, sub

    return jax.lax.scan(body, key, None, length=n)


def make_seg_train_epoch(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    donate: bool = True,
    augment: bool = False,
    fused_loss: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
    aug_quantize: int = 0,
) -> Callable:
    """Whole-epoch seg training: ``epoch(state, prev_variables,
    (images (S,B,H,W,C), masks (S,B,H,W,1)), pos_weight, keys (S,)) ->
    (state, mean_metrics)``.  Metrics are per-step means averaged over the
    S steps on device (matching the loop path's equal-weight epoch average).

    ``external_uncertainty=True``: ``prev_variables`` instead carries the
    STACKED precomputed probabilities ``(S, B, res, res, K)`` from the
    pipelined producer (parallel/pipeline.py) — one slice feeds each
    scanned step, so a chunk of uncertainty maps produced on a disjoint
    device group drives a whole scanned chunk of train steps.
    """
    body = _build_seg_train_body(
        module, tx, stage, resolution, prev_module, prev_resolution,
        alpha, augment, fused_loss, accum_steps, external_uncertainty,
        aug_quantize=aug_quantize,
    )

    def epoch(state: TrainState, prev_variables, batches, pos_weight, keys):
        images, masks = batches

        if external_uncertainty:
            def scan_body(st, xs):
                pu, img, msk, k = xs
                return body(st, pu, (img, msk), pos_weight, k)

            xs = (prev_variables, images, masks, keys)
        else:
            def scan_body(st, xs):
                img, msk, k = xs
                return body(st, prev_variables, (img, msk), pos_weight, k)

            xs = (images, masks, keys)

        state, ms = jax.lax.scan(scan_body, state, xs)
        return state, jax.tree.map(jnp.mean, ms)

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_seg_eval_epoch(
    module,
    stage: int,
    resolution: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
) -> Callable:
    """Whole-epoch seg validation over stacked batches; returns mean metrics."""
    body = _build_seg_eval_body(
        module, stage, resolution, prev_module, prev_resolution, alpha
    )

    def epoch(variables, prev_variables, batches, pos_weight):
        images, masks = batches

        def scan_body(carry, xs):
            img, msk = xs
            return carry, body(variables, prev_variables, (img, msk), pos_weight)

        _, ms = jax.lax.scan(scan_body, 0, (images, masks))
        return jax.tree.map(jnp.mean, ms)

    return jax.jit(epoch)


def make_cls_train_epoch(
    module,
    tx: optax.GradientTransformation,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    donate: bool = True,
    augment: bool = False,
    normalize: bool = False,
    accum_steps: int = 1,
    external_uncertainty: bool = False,
) -> Callable:
    """Whole-epoch cls training.  ``correct``/``count`` come back summed
    over the epoch (accuracy = correct/count), other metrics as means —
    mirroring ``HerlevTrainer._reduce_epoch``.

    ``external_uncertainty=True``: ``prev_variables`` carries the STACKED
    precomputed per-sample weights ``(S, B)`` from the pipelined producer
    (parallel/pipeline.py); one row feeds each scanned step."""
    body = _build_cls_train_body(
        module, tx, stage, resolution, num_classes, prev_module,
        prev_resolution, alpha, augment, normalize, accum_steps,
        external_uncertainty,
    )

    def epoch(state: TrainState, prev_variables, batches, class_weights, keys):
        images, labels = batches

        if external_uncertainty:
            def scan_body(st, xs):
                uw, img, lbl, k = xs
                return body(st, uw, (img, lbl), class_weights, k)

            xs = (prev_variables, images, labels, keys)
        else:
            def scan_body(st, xs):
                img, lbl, k = xs
                return body(st, prev_variables, (img, lbl), class_weights, k)

            xs = (images, labels, keys)

        state, ms = jax.lax.scan(scan_body, state, xs)
        return state, _reduce_cls_epoch_metrics(ms)

    return jax.jit(epoch, donate_argnums=(0,) if donate else ())


def make_cls_eval_epoch(
    module,
    stage: int,
    resolution: int,
    num_classes: int,
    prev_module=None,
    prev_resolution: int | None = None,
    alpha: float = 1.0,
    normalize: bool = False,
) -> Callable:
    body = _build_cls_eval_body(
        module, stage, resolution, num_classes, prev_module,
        prev_resolution, alpha, normalize,
    )

    def epoch(variables, prev_variables, batches, class_weights):
        images, labels = batches

        def scan_body(carry, xs):
            img, lbl = xs
            m = dict(body(variables, prev_variables, (img, lbl), class_weights))
            m.pop("logits")  # don't materialize (S, B, K) logits in the scan
            return carry, m

        _, ms = jax.lax.scan(scan_body, 0, (images, labels))
        return _reduce_cls_epoch_metrics(ms)

    return jax.jit(epoch)


def _reduce_cls_epoch_metrics(ms):
    out = {}
    for k, v in ms.items():
        if k in ("correct", "count"):
            out[k] = jnp.sum(v)
        else:
            out[k] = jnp.mean(v)
    return out


# ----------------------------------------------------------------------
# Scan-epoch orchestration helpers shared by both trainers.


def scan_usable(first_batch, mesh) -> bool:
    """Static scan-path eligibility — checked BEFORE any stacking so
    ineligible configurations don't pay a full-epoch copy: single-process
    feeding only, and (under a mesh) the per-step batch must divide the
    'data' axis."""
    if mesh is None:
        return True
    if jax.process_count() > 1:
        return False
    return np.shape(first_batch[0])[0] % mesh.shape["data"] == 0


def _batch_nbytes(batch) -> int:
    """Host-side byte estimate of one batch, without forcing a device
    fetch (``jax.Array``/ndarray expose ``nbytes`` directly)."""
    total = 0
    for x in batch:
        nb = getattr(x, "nbytes", None)
        total += int(nb) if nb is not None else np.asarray(x).nbytes
    return total


def plan_epoch_chunks(batches: list, max_bytes: int | None):
    """Chunk the uniform prefix into fixed-size scan windows.

    Returns ``(ranges, tail_start)`` where each ``(a, b)`` in ``ranges``
    is an equal-length slice of ``batches`` to stack into one ``(S, B,
    ...)`` scan program, and ``batches[tail_start:]`` runs per-step.  With
    ``max_bytes`` set, ``S`` is capped so one stacked chunk holds at most
    that many bytes — the epoch is dispatched as several scan calls (one
    stack + one transfer each) instead of one unbounded whole-epoch stack,
    so ``scan_epochs`` degrades gracefully on datasets that don't fit the
    cap (VERDICT r2 #6).  All chunks share one length ``S`` (a single XLA
    program); the indivisible remainder joins the per-step tail.
    """
    shapes = [tuple(np.shape(b[0])) for b in batches]
    n = 1
    while n < len(batches) and shapes[n] == shapes[0]:
        n += 1
    if max_bytes is None:
        return [(0, n)], n
    per_batch = max(1, _batch_nbytes(batches[0]))
    s = max(1, int(max_bytes) // per_batch)
    if s >= n:
        return [(0, n)], n
    n_chunks = n // s
    ranges = [(i * s, (i + 1) * s) for i in range(n_chunks)]
    return ranges, n_chunks * s


def stack_epoch(batches: list):
    """Split an epoch's batches into (stacked uniform prefix, tail).

    The prefix — every leading batch shaped like the first — stacks to
    ``(S, B, ...)`` arrays for the ``lax.scan`` epoch program; the ragged
    remainder (dataset tail without ``drop_last``) is returned for per-step
    dispatch so shapes stay static.

    Device-resident batches (all leaves ``jax.Array``, e.g. a small dataset
    cached in HBM across epochs) stack ON DEVICE with ``jnp.stack`` — no
    host round trip; host batches stack in numpy for one bulk transfer."""
    shapes = [tuple(np.shape(b[0])) for b in batches]
    n = 1
    while n < len(batches) and shapes[n] == shapes[0]:
        n += 1
    prefix, tail = batches[:n], batches[n:]
    on_device = all(isinstance(x, jax.Array) for x in batches[0])
    if on_device:
        stacked = tuple(
            jnp.stack([b[i] for b in prefix]) for i in range(len(batches[0]))
        )
    else:
        stacked = tuple(
            np.stack([np.asarray(b[i]) for b in prefix])
            for i in range(len(batches[0]))
        )
    return stacked, tail


def put_stacked(stacked, mesh):
    """Device-put a stacked epoch; under a mesh, axis 1 (the per-step
    batch axis) shards over 'data'."""
    if mesh is not None:
        from ugpg_tpu.parallel.mesh import shard_stacked_batch

        return shard_stacked_batch(stacked, mesh)
    return jax.device_put(stacked)

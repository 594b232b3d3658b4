"""Pipeline-parallel uncertainty stage: prev-model inference on its own chips.

Every stage>1 train step in the reference runs TWO full model forwards per
batch — the current model (fwd+bwd) and a second, *frozen* previous-stage
forward that only produces the uncertainty map
(ref: UG_unet.py:19-59 via uncertainty_guided_trainer.py:143-157).  The
fused single-program step (train/steps.py) already makes that second
forward cheap, but it still serializes with the train step on the same
chips.

This module is the SURVEY §2h pipeline-parallel design: the progressive
method's frozen-inference stage becomes a real pipeline stage on a
DISJOINT device group.

    device split:   [ train group: (data, model) mesh ]  [ unc group ]
    program U (unc group):   resize -> (augment) -> prev fwd -> sigmoid
                             -> upsample  => probs_up            (k+1)
    program T (train group): external-uncertainty train step      (k)

The host dispatches U(k+1) before blocking on T(k); JAX's async dispatch
runs the two programs concurrently because they touch disjoint devices —
U's latency hides behind T's.  The only cross-group traffic is ``probs_up``
(B, res, res, K) once per step (device-to-device over ICI on a real slice).

Semantics are EXACT, not approximate: program U replicates the train
step's in-graph preprocessing (stage resize + the rng-keyed augmentation;
for classification also the ImageNet normalization and the step's exact
rng split) so the frozen forward sees the identical pixels the fused step
would feed it; tests assert the pipelined step-0 metrics match the fused
single-program step to rtol 2e-5 and trajectories track within the GSPMD
reduction-noise envelope (tests/test_pipeline.py).

Both the reference's task families pipeline: segmentation transfers the
(B, res, res, K) probability map; classification transfers only the (B,)
per-sample entropy weights (ref: Herlev/train_herlev.py:216-296).

When it pays: the prev-stage forward costs roughly
(prev_res/res)^2 * 1/3 of the train step (half resolution, forward-only),
so ONE uncertainty chip can feed ~10 train chips; use small ``n_unc``.
On a single chip there is nothing to overlap — keep the fused step.
"""

from __future__ import annotations

from collections import deque
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugpg_tpu.data.augment import (
    augment_herlev_batch,
    augment_monuseg_batch,
    imagenet_normalize,
)
from ugpg_tpu.ops.resize import resize_bilinear_align_corners
from ugpg_tpu.parallel.mesh import make_mesh, shard_variables
from ugpg_tpu.train.steps import (
    TrainState,
    make_cls_train_epoch,
    make_cls_train_step,
    make_seg_train_epoch,
    make_seg_train_step,
    plan_epoch_chunks,
    stack_epoch,
)
from ugpg_tpu.uncertainty import classification_uncertainty_weights

__all__ = [
    "split_devices",
    "make_uncertainty_program",
    "make_cls_uncertainty_program",
    "UncertaintyPipeline",
]


def split_devices(n_unc: int, devices=None):
    """Split the visible devices into (train_group, unc_group).

    The LAST ``n_unc`` devices become the uncertainty-inference group so the
    train group keeps the ICI-contiguous prefix (mesh-friendly ordering).
    """
    devices = list(devices if devices is not None else jax.devices())
    if not 1 <= n_unc < len(devices):
        raise ValueError(
            f"n_unc={n_unc} must leave at least one train device out of "
            f"{len(devices)} visible"
        )
    return devices[:-n_unc], devices[-n_unc:]


def _build_seg_unc_body(
    prev_module,
    resolution: int,
    prev_resolution: int,
    augment: bool,
    accum_steps: int = 1,
    aug_quantize: int = 0,
) -> Callable:
    """Un-jitted seg producer body: images -> upsampled prev probabilities.

    Mirrors the fused step's pre-uncertainty chain exactly
    (train/steps.py::_build_seg_train_body): bilinear-ac resize to the
    stage resolution, optionally the rng-keyed MoNuSeg augmentation (the
    image half — masks do not influence the image transform), then the
    frozen prev forward at prev_resolution and the upsample back
    (ref chain: UG_unet.py:19-59).

    ``accum_steps=K``: the consumer step splits the batch into K
    micro-batches, each augmented with its own subkey
    (train/steps.py::_accum_scan's ``jax.random.split(rng, K)`` stream) —
    the producer replicates that keying per micro-slice so the SAME pixels
    reach the frozen forward; the forward itself still runs on the full
    batch at once (key-independent after augmentation).
    """

    def _augmented(x, rng):
        if accum_steps == 1:
            dummy = jnp.zeros(x.shape[:3] + (1,), x.dtype)
            x, _ = augment_monuseg_batch(
                rng, x, dummy, quantize_angles=aug_quantize
            )
            return x
        b = x.shape[0]
        m = b // accum_steps
        keys = jax.random.split(rng, accum_steps)
        xm = x.reshape(accum_steps, m, *x.shape[1:])
        xm = jax.vmap(
            lambda k, im: augment_monuseg_batch(
                k, im, jnp.zeros(im.shape[:3] + (1,), im.dtype),
                quantize_angles=aug_quantize,
            )[0]
        )(keys, xm)
        return xm.reshape(b, *x.shape[1:])

    def unc_fn(prev_variables, images, rng):
        x = resize_bilinear_align_corners(images, (resolution, resolution))
        if augment:
            x = _augmented(x, rng)
        x_prev = resize_bilinear_align_corners(
            x, (prev_resolution, prev_resolution)
        )
        probs = jax.nn.sigmoid(prev_module.apply(prev_variables, x_prev, False))
        return resize_bilinear_align_corners(probs, (resolution, resolution))

    return unc_fn


def make_uncertainty_program(
    prev_module,
    resolution: int,
    prev_resolution: int,
    unc_mesh: Mesh,
    augment: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Compile program U: images -> upsampled prev-stage probabilities."""
    out = NamedSharding(unc_mesh, P("data"))
    return jax.jit(
        _build_seg_unc_body(
            prev_module, resolution, prev_resolution, augment, accum_steps
        ),
        out_shardings=out,
    )


def _build_cls_unc_body(
    prev_module,
    resolution: int,
    prev_resolution: int,
    num_classes: int,
    alpha: float,
    augment: bool,
    normalize: bool,
    accum_steps: int = 1,
) -> Callable:
    """Un-jitted cls producer body: images -> per-sample weights (B,).

    Mirrors the cls step's preprocessing (augment at input res -> ImageNet
    normalize -> stage resize; train/steps.py::_build_cls_train_body,
    including its ``rng -> (rng, akey)`` split so the SAME augmentation
    pixels reach the frozen forward), then the prev forward and the
    entropy/binary per-sample weights 1 + alpha*A
    (ref: Herlev/train_herlev.py:216-296).

    ``accum_steps=K``: replicates the consumer's per-micro keying — micro
    ``i`` augments with ``split(split(rng, K)[i])[1]`` (_accum_scan's
    subkey stream followed by the micro body's akey split).
    """

    def _augmented(images, rng):
        if accum_steps == 1:
            _, akey = jax.random.split(rng)
            return augment_herlev_batch(akey, images)
        b = images.shape[0]
        m = b // accum_steps
        keys = jax.random.split(rng, accum_steps)
        im = images.reshape(accum_steps, m, *images.shape[1:])
        im = jax.vmap(
            lambda k, x: augment_herlev_batch(jax.random.split(k)[1], x)
        )(keys, im)
        return im.reshape(b, *images.shape[1:])

    def unc_fn(prev_variables, images, rng):
        if augment:
            images = _augmented(images, rng)
        if normalize:
            images = imagenet_normalize(images)
        x = resize_bilinear_align_corners(images, (resolution, resolution))
        x_prev = resize_bilinear_align_corners(
            x, (prev_resolution, prev_resolution)
        )
        prev_logits = prev_module.apply(prev_variables, x_prev, False)
        return classification_uncertainty_weights(
            prev_logits, num_classes, alpha
        )

    return unc_fn


def make_cls_uncertainty_program(
    prev_module,
    resolution: int,
    prev_resolution: int,
    num_classes: int,
    alpha: float,
    unc_mesh: Mesh,
    augment: bool = False,
    normalize: bool = False,
    accum_steps: int = 1,
) -> Callable:
    """Compile program U for classification (see _build_cls_unc_body)."""
    out = NamedSharding(unc_mesh, P("data"))
    return jax.jit(
        _build_cls_unc_body(
            prev_module, resolution, prev_resolution, num_classes, alpha,
            augment, normalize, accum_steps,
        ),
        out_shardings=out,
    )


def _make_unc_epoch_program(unc_body: Callable, unc_mesh: Mesh) -> Callable:
    """Stacked producer: ``(prev_variables, images (S,B,...), keys (S,)) ->
    outs (S, B, ...)`` — one ``lax.scan`` over the per-batch producer body,
    so a whole chunk of uncertainty maps is produced in ONE dispatch on the
    unc group while the train group scans the previous chunk
    (chunk-level pipelining; see UncertaintyPipeline.run_epoch_scan)."""
    out = NamedSharding(unc_mesh, P(None, "data"))

    def epoch_fn(prev_variables, images_st, keys):
        def body(_, xs):
            img, k = xs
            return 0, unc_body(prev_variables, img, k)

        _, outs = jax.lax.scan(body, 0, (images_st, keys))
        return outs

    return jax.jit(epoch_fn, out_shardings=out)


class UncertaintyPipeline:
    """Two-program pipelined trainer for one progressive stage (stage > 1).

    Parameters
    ----------
    module, prev_module : flax modules for the current / previous stage.
    tx : optax transformation (e.g. train.optim.torch_rmsprop).
    stage, resolution, prev_resolution : as in make_seg_train_step.
    task_type : 'segmentation' (probs_up pipelined, pos_weight scalar) or
        'classification' (per-sample (B,) weights pipelined, class_weights
        vector) — the same axis the ProgressiveUNet facade exposes.
    n_unc : devices dedicated to the uncertainty program (from the tail of
        ``devices``); the rest form the train mesh.
    n_model : TP width of the train mesh (wide conv kernels over 'model').
    alpha, augment, fused_loss : as in make_seg_train_step.
    num_classes, normalize : classification only (make_cls_train_step).
    depth : pipeline depth — how many uncertainty batches may be in flight
        ahead of the train step (2 = classic one-ahead double buffering).
    accum_steps : gradient accumulation inside the consumer step; the
        producer replicates the per-micro augmentation keying so the same
        pixels reach the frozen forward (see _build_seg_unc_body).
    """

    def __init__(
        self,
        module,
        prev_module,
        tx,
        stage: int,
        resolution: int,
        prev_resolution: int,
        *,
        task_type: str = "segmentation",
        n_unc: int = 1,
        n_model: int = 1,
        devices=None,
        alpha: float = 1.0,
        augment: bool = False,
        fused_loss: bool = False,
        num_classes: int = 1,
        normalize: bool = False,
        depth: int = 2,
        donate: bool = True,
        accum_steps: int = 1,
        aug_quantize: int = 0,
    ):
        if stage <= 1:
            raise ValueError(
                "pipeline parallelism applies to stages > 1 (stage 1 has no "
                "frozen previous model to offload)"
            )
        if depth < 1:
            raise ValueError(f"depth must be >= 1, got {depth}")
        if task_type not in ("segmentation", "classification"):
            raise ValueError(f"unknown task_type: {task_type!r}")
        train_devs, unc_devs = split_devices(n_unc, devices)
        n_train = (len(train_devs) // n_model) * n_model
        if n_train == 0:
            raise ValueError(
                f"{len(train_devs)} train device(s) cannot host a "
                f"model-axis of {n_model}"
            )
        self.train_mesh = make_mesh(
            n_train // n_model, n_model, devices=train_devs[:n_train]
        )
        self.unc_mesh = make_mesh(n_unc, 1, devices=unc_devs)
        self.depth = depth
        self.resolution = resolution
        self.accum_steps = int(accum_steps)
        self._module = module
        self._tx = tx
        self._shard_model = n_model > 1

        if task_type == "segmentation":
            unc_body = _build_seg_unc_body(
                prev_module, resolution, prev_resolution, augment,
                self.accum_steps, aug_quantize,
            )
            self._step = make_seg_train_step(
                module, tx, stage, resolution,
                alpha=alpha, augment=augment, fused_loss=fused_loss,
                donate=donate, external_uncertainty=True,
                accum_steps=self.accum_steps, aug_quantize=aug_quantize,
            )
            self._make_epoch = lambda: make_seg_train_epoch(
                module, tx, stage, resolution,
                alpha=alpha, augment=augment, fused_loss=fused_loss,
                donate=donate, external_uncertainty=True,
                accum_steps=self.accum_steps, aug_quantize=aug_quantize,
            )
        else:
            unc_body = _build_cls_unc_body(
                prev_module, resolution, prev_resolution, num_classes,
                alpha, augment, normalize, self.accum_steps,
            )
            self._step = make_cls_train_step(
                module, tx, stage, resolution, num_classes,
                alpha=alpha, augment=augment, normalize=normalize,
                donate=donate, external_uncertainty=True,
                accum_steps=self.accum_steps,
            )
            self._make_epoch = lambda: make_cls_train_epoch(
                module, tx, stage, resolution, num_classes,
                alpha=alpha, augment=augment, normalize=normalize,
                donate=donate, external_uncertainty=True,
                accum_steps=self.accum_steps,
            )
        self._unc = jax.jit(
            unc_body, out_shardings=NamedSharding(self.unc_mesh, P("data"))
        )
        self._unc_epoch = _make_unc_epoch_program(unc_body, self.unc_mesh)
        self._epoch = None  # consumer epoch program, built on first use
        self._batch_t = NamedSharding(self.train_mesh, P("data"))
        self._batch_u = NamedSharding(self.unc_mesh, P("data"))
        self._stack_t = NamedSharding(self.train_mesh, P(None, "data"))
        self._stack_u = NamedSharding(self.unc_mesh, P(None, "data"))
        self._repl_t = NamedSharding(self.train_mesh, P())
        self._repl_u = NamedSharding(self.unc_mesh, P())

    # ------------------------------------------------------------------
    def create_state(self, variables) -> TrainState:
        """Shard current-stage variables on the train mesh (TP layout when
        n_model > 1) and build the TrainState there."""
        v = shard_variables(variables, self.train_mesh, self._shard_model)
        return TrainState.create(v, self._tx)

    def place_prev(self, prev_variables):
        """Replicate the frozen previous-stage tree on the unc group."""
        return jax.device_put(prev_variables, self._repl_u)

    # ------------------------------------------------------------------
    def run_epoch(
        self,
        state: TrainState,
        prev_variables,
        batches: Sequence[tuple],
        loss_weights,
        keys,
    ) -> tuple[TrainState, list[dict[str, Any]]]:
        """Pipelined epoch: dispatch U(k+1..k+depth) ahead of T(k).

        ``batches`` is a sequence of host ``(images NHWC, masks NHW1)``
        (segmentation) or ``(images NHWC, labels (B,))`` (classification)
        pairs; ``loss_weights`` is the seg ``pos_weight`` scalar or the cls
        ``class_weights`` vector; ``keys`` one PRNG key per batch (the same
        key drives the augmentation in BOTH programs, which is what keeps
        the pipelined semantics identical to the fused step).  Returns the
        final state and the per-step metric dicts (device scalars, fetch
        lazily).
        """
        if len(keys) < len(batches):
            raise ValueError(f"need {len(batches)} keys, got {len(keys)}")
        self._validate_batches(batches)
        # None = unweighted CE (the cls trainer's default when the dataset
        # supplies no class weights); the step treats None as a leafless tree
        loss_w = (
            None
            if loss_weights is None
            else jax.device_put(jnp.asarray(loss_weights), self._repl_t)
        )
        metrics: list[dict[str, Any]] = []
        inflight: deque = deque()

        def consume(item):
            nonlocal state
            unc_out, batch, key = item
            # cross-group hop: the ONLY inter-mesh traffic per step
            unc_t = jax.device_put(unc_out, self._batch_t)
            batch_t = tuple(jax.device_put(a, self._batch_t) for a in batch)
            state, m = self._step(state, unc_t, batch_t, loss_w, key)
            metrics.append(m)

        for batch, key in zip(batches, keys):
            images_u = jax.device_put(batch[0], self._batch_u)
            probs_up = self._unc(prev_variables, images_u, key)
            inflight.append((probs_up, batch, key))
            if len(inflight) > self.depth:
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())
        return state, metrics

    def _validate_batches(self, batches):
        """Reject ragged/indivisible batches up front (a drop_last=False
        loader's short final batch would otherwise crash deep in device_put
        after the whole epoch has been dispatched)."""
        n_t = self.train_mesh.shape["data"]
        n_u = self.unc_mesh.shape["data"]
        for i, batch in enumerate(batches):
            b = batch[0].shape[0]
            if b % n_t or b % n_u:
                raise ValueError(
                    f"batch {i} has size {b}, which must divide both the "
                    f"train mesh's data axis ({n_t}) and the unc group "
                    f"({n_u}); pick n_unc so that (n_devices - n_unc) and "
                    f"n_unc both divide every batch, and drop or pad the "
                    f"ragged final batch (loader drop_last=True)"
                )
            if b % (self.accum_steps * n_t):
                raise ValueError(
                    f"batch {i} has size {b}, not divisible into "
                    f"accum_steps={self.accum_steps} micro-batches per "
                    f"data shard ({n_t})"
                )

    # ------------------------------------------------------------------
    def run_epoch_scan(
        self,
        state: TrainState,
        prev_variables,
        batches: Sequence[tuple],
        loss_weights,
        keys,
        chunk_bytes: int | None = None,
    ):
        """CHUNK-level pipelined epoch: scan-dispatch composition.

        ``run_epoch`` overlaps at batch granularity but pays one host
        dispatch per step; the scan-epoch path (train/steps.py) removes the
        per-step dispatch but — as previously shipped — fused the frozen
        forward back into the train program.  This method composes the two:
        the unc group produces a STACKED ``(S_chunk, B, ...)`` block of
        maps in ONE scanned program (``_make_unc_epoch_program``) while the
        train group scans the PREVIOUS chunk's train steps (the
        external-uncertainty epoch program, train steps consuming one map
        slice per scanned step).  Chunks come from
        ``train.steps.plan_epoch_chunks`` (equal-length slices bounded by
        ``chunk_bytes``); classic one-ahead double buffering at chunk
        granularity hides the producer entirely when it is faster than a
        chunk of train steps.

        The RNG stream is the SAME per-step subkey sequence as both the
        per-step pipeline and the plain scan path, so all three
        trajectories match (tests/test_pipeline.py).

        Returns ``(state, parts, tail_metrics)`` where ``parts`` is a list
        of ``(mean_metrics, n_steps)`` per chunk and ``tail_metrics`` the
        per-step metric dicts for the ragged tail — the same contract the
        trainers' scan paths combine with ``_combine_scan_metrics``.
        """
        if len(keys) < len(batches):
            raise ValueError(f"need {len(batches)} keys, got {len(keys)}")
        self._validate_batches(batches)
        keys_st = (
            keys if hasattr(keys, "shape") else jnp.stack(list(keys))
        )
        ranges, tail_start = plan_epoch_chunks(list(batches), chunk_bytes)
        tail = list(batches[tail_start:])
        if self._epoch is None:
            self._epoch = self._make_epoch()
        loss_w = (
            None
            if loss_weights is None
            else jax.device_put(jnp.asarray(loss_weights), self._repl_t)
        )
        parts: list[tuple] = []
        inflight: deque = deque()

        def consume(item):
            nonlocal state
            unc_st, stacked, kchunk, n = item
            # cross-group hop: one stacked block per chunk
            unc_t = jax.device_put(unc_st, self._stack_t)
            batch_t = tuple(
                jax.device_put(a, self._stack_t) for a in stacked
            )
            state, mean_metrics = self._epoch(
                state, unc_t, batch_t, loss_w, kchunk
            )
            parts.append((mean_metrics, n))

        for a, b in ranges:
            stacked, _ = stack_epoch(list(batches[a:b]))
            kchunk = keys_st[a:b]
            images_u = jax.device_put(stacked[0], self._stack_u)
            unc_st = self._unc_epoch(prev_variables, images_u, kchunk)
            inflight.append((unc_st, stacked, kchunk, b - a))
            if len(inflight) > 1:  # one chunk ahead
                consume(inflight.popleft())
        while inflight:
            consume(inflight.popleft())

        tail_metrics: list[dict[str, Any]] = []
        for i, batch in enumerate(tail):
            key = keys_st[tail_start + i]
            images_u = jax.device_put(batch[0], self._batch_u)
            unc_out = self._unc(prev_variables, images_u, key)
            unc_t = jax.device_put(unc_out, self._batch_t)
            batch_t = tuple(jax.device_put(a, self._batch_t) for a in batch)
            state, m = self._step(state, unc_t, batch_t, loss_w, key)
            tail_metrics.append(m)
        return state, parts, tail_metrics

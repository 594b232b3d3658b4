"""Uncertainty-guided progressive trainer for segmentation.

Host-side engine reproducing the reference trainer's behavior
(ref: uncertainty_guided_trainer.py:25-525) on top of the fused jit steps:

* stage configs {1: (32px, 40ep, lr 3e-4), 2-4: (64/128/256px, 40ep, 1e-4)}
  (ref: :42-47)
* RMSprop(weight_decay=1e-4) rebuilt per stage (ref: :81-88)
* BCEWithLogits(pos_weight=5.0) base loss (ref: :64-65)
* weight transfer at stage entry (ref: :125-141), uncertainty guidance from
  the frozen previous stage for stages > 1 (ref: :143-184)
* best-val-Dice checkpoint per stage with the reference metadata schema
  (ref: :382-393), history dict, training plots, uncertainty analysis JSON

The hot loop is pure device work: one fused train step per batch, metric
scalars read back asynchronously at epoch end (no per-batch .item() syncs).
"""

from __future__ import annotations

import json
import time
from pathlib import Path
from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.data.loader import prefetch_to_device
from ugpg_tpu.io.checkpoint import has_checkpoint, load_checkpoint, save_checkpoint
from ugpg_tpu.models.pgunet import STAGE_MODELS
from ugpg_tpu.parallel.distributed import global_batch
from ugpg_tpu.parallel.mesh import shard_batch, shard_variables
from ugpg_tpu.progressive.transfer import transfer_weights
from ugpg_tpu.train.optim import get_learning_rate, torch_rmsprop
from ugpg_tpu.train.steps import (
    TrainState,
    make_seg_eval_epoch,
    make_seg_eval_step,
    make_seg_train_epoch,
    make_seg_train_step,
    plan_epoch_chunks,
    put_stacked,
    scan_usable,
    split_epoch_keys,
    stack_epoch,
)
from ugpg_tpu.utils.anomaly import TrainingDivergedError, nonfinite_metrics
from ugpg_tpu.utils.profiling import CSVLogger

__all__ = ["UncertaintyGuidedProgressiveTrainer", "DEFAULT_STAGE_CONFIGS"]

_UNSET = object()  # sentinel: "inherit the trainer's dtype"

DEFAULT_STAGE_CONFIGS = {
    1: {"resolution": 32, "epochs_per_stage": 40, "lr": 3e-4},
    2: {"resolution": 64, "epochs_per_stage": 40, "lr": 1e-4},
    3: {"resolution": 128, "epochs_per_stage": 40, "lr": 1e-4},
    4: {"resolution": 256, "epochs_per_stage": 40, "lr": 1e-4},
}

_METRIC_KEYS = (
    "final_loss",
    "base_loss",
    "dice",
    "accuracy",
    "uncertainty_weight_mean",
    "uncertainty_weight_std",
)


def _combine_scan_metrics(parts: list, tail_metrics: list):
    """Equal-weight epoch average across scanned chunks (``(mean_metrics,
    n_steps)`` pairs) and tail steps (matches the per-step path's
    mean-of-batches); ONE host fetch."""
    parts, tm = jax.device_get((parts, tail_metrics))
    n_total = sum(n for _, n in parts) + len(tm)
    return tuple(
        (
            sum(float(mm[k]) * n for mm, n in parts)
            + sum(float(m[k]) for m in tm)
        )
        / n_total
        for k in _METRIC_KEYS
    )


class UncertaintyGuidedProgressiveTrainer:
    """Progressive 4-stage trainer with uncertainty-guided loss weighting."""

    def __init__(
        self,
        in_channels: int = 3,
        num_classes: int = 1,
        uncertainty_alpha: float = 1.0,
        pos_weight: float = 5.0,
        weight_decay: float = 1e-4,
        stage_configs: Mapping[int, Mapping[str, Any]] | None = None,
        dtype=None,
        axis_name: str | None = None,
        seed: int = 0,
        verbose: bool = True,
        augment: bool = False,
        fused_loss: bool = False,
        mesh=None,
        shard_model: bool = True,
        checkpoint_backend: str = "msgpack",
        scan_epochs: bool = False,
        scan_chunk_bytes: int | None = 1 << 30,
        tb_logdir=None,
        accum_steps: int = 1,
        remat: bool = False,
        pipeline_unc: int = 0,
        nan_guard: bool = True,
        width: float = 1.0,
        aug_quantize: int = 0,
    ):
        """``mesh``: a ``jax.sharding.Mesh`` with ('data', 'model') axes (see
        ``parallel.mesh.make_mesh``).  When set, stage variables are sharded
        at stage entry (TP over wide conv kernels if ``shard_model``),
        batches are split over the 'data' axis, and multi-process runs feed
        per-host shards through ``parallel.distributed.global_batch`` — the
        SAME fused step then compiles as one GSPMD program with XLA-inserted
        collectives over ICI.  Global batch size must divide the 'data' axis
        size.

        ``scan_epochs``: fuse each epoch's steps into ONE ``lax.scan``
        program (one dispatch + one metric fetch per epoch instead of per
        batch) — the trajectory is identical to the per-step path (same
        bodies, same RNG subkey sequence).  Epoch batches are stacked on
        the host and transferred once; ragged tail batches fall back to
        per-step dispatch.  Best for small/medium datasets or remote
        (tunneled) backends where per-step launch latency dominates;
        multi-process runs ignore it (per-host feeding is per-batch).

        ``scan_chunk_bytes`` (default 1 GiB) caps how much of the epoch is
        stacked/transferred per scan dispatch: oversized epochs run as
        several equal-length scan programs instead of one unbounded stack,
        so host/HBM memory degrades gracefully at aug-patch dataset scale.
        ``None`` = unbounded (whole epoch in one program).

        ``accum_steps=K``: gradient accumulation — every loader batch (size
        K*m, must divide by K) runs as K sequential micro-batches inside
        one XLA program with ONE optimizer update and sequential BN-stat
        threading; use for effective batch sizes whose activations exceed
        HBM.  Composes with ``scan_epochs`` and ``mesh`` (micro-batches
        stay data-sharded).

        ``remat=True``: rematerialize every DoubleConv in the backward pass
        (``jax.checkpoint``) — block-internal activations are recomputed
        instead of stored, cutting peak activation memory at the cost of
        one extra forward's FLOPs.  Gradients/BN updates are identical.
        Use with the spatial grid / native-resolution fine-tune where
        activations, not parameters, bound the batch size.

        ``pipeline_unc=N``: pipeline parallelism over the method's built-in
        inference stage — dedicate the LAST N visible devices to the frozen
        previous-stage uncertainty forward (its own compiled program) while
        the remaining devices run the train step data-parallel; the host
        dispatches the uncertainty program one batch ahead so the two
        overlap (``parallel.pipeline.UncertaintyPipeline``).  Stage-1
        epochs (no previous model) run the normal path.  Mutually exclusive
        with ``mesh=`` (the pipeline builds its own train mesh).  Composes
        with ``scan_epochs`` (CHUNK-level pipelining: the unc group
        produces a stacked block of maps in one scanned program while the
        train group scans the previous chunk) and with ``accum_steps>1``
        (the producer's maps split into micro-batches with matched
        augmentation keying).

        ``width``: channel-width multiplier for every stage's convs
        (1.0 = the reference widths, ref: UG_unet.py:178-304).  Narrow
        variants keep the exact topology and layer names, so transfer /
        checkpoint / resume work unchanged — used for compile-bounded
        validation (the driver dryrun's full-trainer phase) and small
        deployments.

        ``aug_quantize=N`` (opt-in, with ``augment``): replace the
        augmentation's continuous per-sample rotation gather with the
        angle-quantized MXU shear path — N discrete angles, constant-index
        programs (ops/rotate.py; A/B numbers in BASELINE.md
        §train-roofline).  Changes only the rotation-angle marginal
        (discrete uniform over N points instead of continuous).

        ``nan_guard`` (default on): when an epoch's mean train/val loss is
        NaN/Inf, save a ``*_diverged`` diagnostic checkpoint and raise
        ``utils.anomaly.TrainingDivergedError`` instead of silently
        training on garbage for the rest of the stage budget (the
        reference has no finiteness check anywhere)."""
        self.in_channels = in_channels
        self.num_classes = num_classes
        self.uncertainty_alpha = uncertainty_alpha
        self.pos_weight = jnp.asarray(pos_weight, jnp.float32)
        self.weight_decay = weight_decay
        self.stage_configs = {
            s: dict(cfg) for s, cfg in (stage_configs or DEFAULT_STAGE_CONFIGS).items()
        }
        self.verbose = verbose
        self.dtype = dtype
        self.augment = augment
        self.fused_loss = fused_loss
        self.mesh = mesh
        self.shard_model = shard_model
        self.checkpoint_backend = checkpoint_backend
        self.scan_epochs = scan_epochs
        self.scan_chunk_bytes = scan_chunk_bytes
        self.tb_logdir = tb_logdir
        if accum_steps < 1:
            raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")
        self.accum_steps = accum_steps
        self.remat = remat
        self.pipeline_unc = int(pipeline_unc)
        if self.pipeline_unc and mesh is not None:
            raise ValueError(
                "pipeline_unc and mesh are mutually exclusive: the "
                "pipeline builds its own (train, uncertainty) device "
                "split from the visible devices"
            )
        self._pipelines: dict[int, tuple] = {}
        self.aug_quantize = int(aug_quantize)
        self.nan_guard = nan_guard
        self._aug_key = jax.random.key(seed + 1)
        self._print = print if verbose else (lambda *a, **k: None)

        # width != 1.0: narrow stage variants (models/pgunet._scaled) —
        # same topology/names, so transfer/checkpointing work unchanged
        self.width = float(width)
        self.modules = {
            s: cls(num_classes=num_classes, axis_name=axis_name, dtype=dtype,
                   remat=remat, width=self.width)
            for s, cls in STAGE_MODELS.items()
        }
        # Lazily initialized per-stage variable trees.
        rngs = jax.random.split(jax.random.key(seed), 4)
        self.variables: dict[int, Any] = {}
        self._init_rngs = {s: rngs[s - 1] for s in (1, 2, 3, 4)}

        self.current_stage = 1
        self._tx = None
        self._state: TrainState | None = None
        self._train_steps: dict[int, Any] = {}
        self._eval_steps: dict[int, Any] = {}
        self._train_epochs: dict[int, Any] = {}
        self._eval_epochs: dict[int, Any] = {}
        # per-stage device copy of a single-chunk validation epoch (see
        # _validate_epoch_scan)
        self._val_stack_cache: dict[int, Any] = {}

        self.history: dict[str, list] = {
            "train_loss": [],
            "val_loss": [],
            "train_dice": [],
            "val_dice": [],
            "uncertainty_weights_mean": [],
            "uncertainty_weights_std": [],
            "base_loss": [],
            "stage_transitions": [],
        }

    # ------------------------------------------------------------------
    def _ensure_variables(self, stage: int):
        if stage in self.variables:
            # the donating train step invalidates the buffers this tree
            # aliases mid-epoch (repaired at epoch end); after an interrupt
            # the latest valid copy lives in the step's OUTPUT state
            leaves = jax.tree.leaves(self.variables[stage])
            if leaves and getattr(leaves[0], "is_deleted", lambda: False)():
                if self._state is not None and self.current_stage == stage:
                    self.variables[stage] = self._state.variables
                else:  # unrecoverable alias (shouldn't happen): re-init
                    del self.variables[stage]
        if stage not in self.variables:
            res = self.stage_configs[stage]["resolution"]
            x = jnp.zeros((1, res, res, self.in_channels), jnp.float32)
            variables = self.modules[stage].init(
                self._init_rngs[stage], x, False
            )
            self.variables[stage] = self._shard(variables)
        return self.variables[stage]

    def _shard(self, variables):
        if self.mesh is None:
            return variables
        return shard_variables(variables, self.mesh, self.shard_model)

    def setup_optimizer(self, stage: int):
        """Fresh torch-parity RMSprop for the stage (ref: :81-88).

        Under a mesh, variables are (re-)sharded here — stage entry — so the
        optimizer state inherits the same layout."""
        self._tx = torch_rmsprop(
            self.stage_configs[stage]["lr"], weight_decay=self.weight_decay
        )
        variables = self._shard(self._ensure_variables(stage))
        self.variables[stage] = variables
        self._state = TrainState.create(variables, self._tx)
        return self._tx

    def transfer_weights(self, prev_stage: int, new_stage: int):
        """Name-keyed overlap merge from the previous stage (ref: :125-141)."""
        self._print(f"Transferring weights from stage {prev_stage} to stage {new_stage}")
        prev_vars = self._ensure_variables(prev_stage)
        if self.pipeline_unc:
            # after a pipelined stage the trained variables live replicated
            # on the pipeline's train mesh while the new stage inits on the
            # default device — one jitted program cannot mix the two device
            # sets, so normalize through the host (small trees, stage entry
            # only)
            prev_vars = jax.device_get(prev_vars)
        new_vars = self._ensure_variables(new_stage)
        merged, copied = transfer_weights(prev_vars, new_vars)
        self.variables[new_stage] = merged
        self._print(
            f"transfer_weights(stage={new_stage}): copied {len(copied)} keys "
            f"(examples: {copied[:5]})"
        )

    def _get_train_step(self, stage: int):
        if self._tx is None or self._state is None:
            self.setup_optimizer(stage)
        if stage not in self._train_steps:
            cfg = self.stage_configs[stage]
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            self._train_steps[stage] = make_seg_train_step(
                self.modules[stage],
                self._tx,
                stage,
                cfg["resolution"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                augment=self.augment,
                fused_loss=self.fused_loss,
                accum_steps=self.accum_steps,
                aug_quantize=self.aug_quantize,
            )
        return self._train_steps[stage]

    def _get_eval_step(self, stage: int):
        if stage not in self._eval_steps:
            cfg = self.stage_configs[stage]
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            self._eval_steps[stage] = make_seg_eval_step(
                self.modules[stage],
                stage,
                cfg["resolution"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
            )
        return self._eval_steps[stage]

    def _get_train_epoch(self, stage: int):
        self._get_train_step(stage)  # ensures optimizer/state exist
        if stage not in self._train_epochs:
            cfg = self.stage_configs[stage]
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            self._train_epochs[stage] = make_seg_train_epoch(
                self.modules[stage],
                self._tx,
                stage,
                cfg["resolution"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                augment=self.augment,
                fused_loss=self.fused_loss,
                accum_steps=self.accum_steps,
                aug_quantize=self.aug_quantize,
            )
        return self._train_epochs[stage]

    def _get_eval_epoch(self, stage: int):
        if stage not in self._eval_epochs:
            cfg = self.stage_configs[stage]
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            self._eval_epochs[stage] = make_seg_eval_epoch(
                self.modules[stage],
                stage,
                cfg["resolution"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
            )
        return self._eval_epochs[stage]

    def _prev_variables(self, stage: int):
        if stage <= 1:
            return {}
        if self.pipeline_unc and stage in self._pipelines:
            # eval/train state lives on the pipeline's train mesh: the frozen
            # prev tree must share that device set (third cache entry)
            return self._pipelines[stage][2]
        return self._ensure_variables(stage - 1)

    def _get_pipeline(self, stage: int):
        """(UncertaintyPipeline, prev-vars-on-unc-group) for a stage > 1.

        Built at the stage's first training epoch — after transfer_weights
        and setup_optimizer — so the pipeline closes over the stage's
        optimizer and the previous stage's FINAL weights."""
        if stage not in self._pipelines:
            from ugpg_tpu.parallel.pipeline import UncertaintyPipeline

            if self._tx is None or self._state is None:
                self.setup_optimizer(stage)
            pipe = UncertaintyPipeline(
                self.modules[stage],
                self.modules[stage - 1],
                self._tx,
                stage,
                self.stage_configs[stage]["resolution"],
                self.stage_configs[stage - 1]["resolution"],
                task_type="segmentation",
                n_unc=self.pipeline_unc,
                alpha=self.uncertainty_alpha,
                augment=self.augment,
                fused_loss=self.fused_loss,
                accum_steps=self.accum_steps,
                aug_quantize=self.aug_quantize,
            )
            from jax.sharding import NamedSharding, PartitionSpec

            prev_host = jax.device_get(self._ensure_variables(stage - 1))
            prev_unc = pipe.place_prev(prev_host)
            # replica on the TRAIN mesh too: the eval step runs there and
            # one program cannot mix the two device groups
            prev_train = jax.device_put(
                prev_host, NamedSharding(pipe.train_mesh, PartitionSpec())
            )
            self._pipelines[stage] = (pipe, prev_unc, prev_train)
        return self._pipelines[stage]

    def _train_epoch_pipelined(self, batches: list, stage: int):
        """Pipelined epoch: uncertainty program on its own device group, one
        batch ahead of the train step (same RNG subkey stream as the
        per-step path, so the trajectory matches to GSPMD rounding)."""
        from jax.sharding import NamedSharding, PartitionSpec

        pipe, prev, _ = self._get_pipeline(stage)
        # (re-)place the state on the pipeline's train mesh: no-op when it
        # already lives there (every epoch after the first)
        repl = NamedSharding(pipe.train_mesh, PartitionSpec())
        self._state = jax.tree.map(
            lambda x: jax.device_put(x, repl), self._state
        )
        self._aug_key, subs = split_epoch_keys(self._aug_key, len(batches))
        self._state, metrics = pipe.run_epoch(
            self._state, prev, batches, self.pos_weight, list(subs)
        )
        self.variables[stage] = self._state.variables
        return self._average(metrics)

    def _train_epoch_pipelined_scan(self, batches: list, stage: int):
        """scan_epochs × pipeline_unc: chunk-level pipelining — the unc
        group produces a stacked block of maps per chunk while the train
        group scans the previous chunk (same per-step RNG subkey stream as
        every other path; parallel.pipeline.run_epoch_scan)."""
        from jax.sharding import NamedSharding, PartitionSpec

        pipe, prev, _ = self._get_pipeline(stage)
        repl = NamedSharding(pipe.train_mesh, PartitionSpec())
        self._state = jax.tree.map(
            lambda x: jax.device_put(x, repl), self._state
        )
        self._aug_key, subs = split_epoch_keys(self._aug_key, len(batches))
        self._state, parts, tail_metrics = pipe.run_epoch_scan(
            self._state, prev, batches, self.pos_weight, subs,
            chunk_bytes=self.scan_chunk_bytes,
        )
        self.variables[stage] = self._state.variables
        return _combine_scan_metrics(parts, tail_metrics)

    def _as_batch(self, batch):
        images, masks = batch
        if self.mesh is not None:
            if jax.process_count() > 1:
                # each host contributes its local shard of the global batch
                return global_batch((np.asarray(images), np.asarray(masks)),
                                    self.mesh)
            n = np.asarray(images).shape[0]
            if n % self.mesh.shape["data"] == 0:
                return shard_batch(
                    (jnp.asarray(images), jnp.asarray(masks)), self.mesh
                )
            # ragged straggler batch (e.g. dataset tail): replicate instead
            # of sharding — numerically identical, just not data-parallel
            # for this one batch
        return jnp.asarray(images), jnp.asarray(masks)

    def _scan_possible(self) -> bool:
        """Cheap pre-check BEFORE materializing the epoch: multi-process
        mesh feeding is per-batch, so listing the loader would buffer the
        full epoch on every host only to fall back."""
        return self.mesh is None or jax.process_count() == 1

    def _train_epoch_scan(self, batches: list, stage: int):
        if not scan_usable(batches[0], self.mesh):
            return None  # checked before stacking: no wasted epoch copy
        ranges, tail_start = plan_epoch_chunks(batches, self.scan_chunk_bytes)
        tail = batches[tail_start:]
        epoch_fn = self._get_train_epoch(stage)
        prev_vars = self._prev_variables(stage)
        self._aug_key, subs = split_epoch_keys(self._aug_key, len(batches))
        parts = []
        for a, b in ranges:
            # stack + transfer one bounded chunk at a time: peak host/HBM
            # cost is one chunk, not the whole epoch
            stacked, _ = stack_epoch(batches[a:b])
            self._state, mean_metrics = epoch_fn(
                self._state,
                prev_vars,
                put_stacked(stacked, self.mesh),
                self.pos_weight,
                subs[a:b],
            )
            parts.append((mean_metrics, b - a))
        tail_metrics = []
        if tail:
            step_fn = self._get_train_step(stage)
            for i, b in enumerate(tail):
                self._state, m = step_fn(
                    self._state, prev_vars, self._as_batch(b),
                    self.pos_weight, subs[tail_start + i],
                )
                tail_metrics.append(m)
        self.variables[stage] = self._state.variables
        return _combine_scan_metrics(parts, tail_metrics)

    def _validate_epoch_scan(self, batches: list, stage: int,
                             cache_token=None):
        """``cache_token`` (the loader's identity): when the whole epoch
        fits ONE chunk with no ragged tail, its stacked device copy is
        cached per stage — validation sets are static across epochs
        (never shuffled/augmented), so re-stacking + re-transferring the
        identical bytes every epoch is pure waste on a transfer-bound
        link.  The cache stays within the scan_chunk_bytes bound."""
        if not scan_usable(batches[0], self.mesh):
            return None  # checked before stacking: no wasted epoch copy
        ranges, tail_start = plan_epoch_chunks(batches, self.scan_chunk_bytes)
        tail = batches[tail_start:]
        epoch_fn = self._get_eval_epoch(stage)
        prev_vars = self._prev_variables(stage)
        variables = self._state.variables if self._state else self._ensure_variables(stage)
        cacheable = cache_token is not None and not tail and len(ranges) == 1
        parts = []
        for a, b in ranges:
            dev = None
            if cacheable:
                cached = self._val_stack_cache.get(stage)
                if cached is not None and cached[0] == (cache_token, len(batches)):
                    dev = cached[1]
            if dev is None:
                stacked, _ = stack_epoch(batches[a:b])
                dev = put_stacked(stacked, self.mesh)
                if cacheable:
                    self._val_stack_cache[stage] = (
                        (cache_token, len(batches)), dev
                    )
            mean_metrics = epoch_fn(variables, prev_vars, dev, self.pos_weight)
            parts.append((mean_metrics, b - a))
        tail_metrics = []
        if tail:
            step_fn = self._get_eval_step(stage)
            tail_metrics = [
                step_fn(variables, prev_vars, self._as_batch(b), self.pos_weight)
                for b in tail
            ]
        return _combine_scan_metrics(parts, tail_metrics)

    # ------------------------------------------------------------------
    def train_epoch(self, dataloader: Iterable, stage: int):
        """One training epoch; returns the reference's 6-tuple of averages
        (loss, base_loss, dice, accuracy, unc_mean, unc_std) (ref: :186-256)."""
        if self.pipeline_unc and stage > 1:
            batches = list(dataloader)
            if not batches:
                return (0.0,) * len(_METRIC_KEYS)
            if self.scan_epochs:
                return self._train_epoch_pipelined_scan(batches, stage)
            return self._train_epoch_pipelined(batches, stage)
        if self.scan_epochs and self._scan_possible():
            batches = list(dataloader)
            if not batches:
                return (0.0,) * len(_METRIC_KEYS)
            out = self._train_epoch_scan(batches, stage)
            if out is not None:
                return out
            dataloader = batches  # fall through to the per-step path
        step_fn = self._get_train_step(stage)
        prev_vars = self._prev_variables(stage)
        acc: list[dict] = []
        # double-buffered host->HBM prefetch: batch k+1 transfers (and shards,
        # under a mesh) while the step for batch k runs
        batches = prefetch_to_device(iter(dataloader), size=2, put=self._as_batch)
        for batch_idx, batch in enumerate(batches):
            self._aug_key, sub = jax.random.split(self._aug_key)
            self._state, metrics = step_fn(
                self._state, prev_vars, batch, self.pos_weight, sub
            )
            acc.append(metrics)
            if self.verbose and batch_idx % 10 == 0:
                m = {k: float(v) for k, v in metrics.items()}
                unc = (
                    f", Unc_mean: {m['uncertainty_weight_mean']:.4f}" if stage > 1 else ""
                )
                self._print(
                    f"Stage {stage}, Batch {batch_idx}, Loss: {m['final_loss']:.4f}, "
                    f"Base_Loss: {m['base_loss']:.4f}, Dice: {m['dice']:.4f}, "
                    f"Acc: {m['accuracy']:.4f}{unc}"
                )
        self.variables[stage] = self._state.variables
        return self._average(acc)

    def validate_epoch(self, dataloader: Iterable, stage: int):
        """One validation epoch (eval-mode BN, no update) (ref: :258-314)."""
        if self.scan_epochs and self._scan_possible():
            batches = list(dataloader)
            if not batches:
                return (0.0,) * len(_METRIC_KEYS)
            out = self._validate_epoch_scan(
                batches, stage, cache_token=id(dataloader)
            )
            if out is not None:
                return out
            dataloader = batches
        step_fn = self._get_eval_step(stage)
        prev_vars = self._prev_variables(stage)
        variables = self._state.variables if self._state else self._ensure_variables(stage)
        batches = prefetch_to_device(iter(dataloader), size=2, put=self._as_batch)
        acc = [
            step_fn(variables, prev_vars, b, self.pos_weight) for b in batches
        ]
        return self._average(acc)

    @staticmethod
    def _average(acc: list[dict]) -> tuple[float, ...]:
        if not acc:
            return (0.0,) * len(_METRIC_KEYS)
        host = jax.device_get(acc)  # ONE fetch for the whole epoch
        return tuple(
            float(np.mean([float(m[k]) for m in host])) for k in _METRIC_KEYS
        )

    # ------------------------------------------------------------------
    def train_progressive(
        self,
        train_loader: Iterable,
        val_loader: Iterable,
        max_stages: int = 4,
        save_dir: str = "./uncertainty_guided_weights",
        stages: Iterable[int] | None = None,
        checkpoint_every: int | None = None,
        resume: bool = False,
        preemption=None,
    ):
        """Full progressive loop: stages 1..max_stages (ref: :316-398).

        ``checkpoint_every=N`` additionally writes a rolling
        ``ug_pgunet_stage{S}_last`` checkpoint (variables + optimizer state
        + epoch) every N epochs; ``resume=True`` restores the latest one
        from ``save_dir`` and continues mid-stage — real elastic recovery,
        which the reference parses a flag for but never implements
        (ref: train_aug_monuseg.py:172).

        ``preemption`` (a ``utils.preemption.PreemptionGuard``) makes the
        loop preemption-safe: polled at each epoch boundary; when armed
        (SIGTERM on Cloud TPU maintenance, scheduler evictions), the loop
        writes the rolling ``_last`` checkpoint, flushes async saves, and
        returns early — ``resume=True`` continues exactly there."""
        save_path = Path(save_dir)
        save_path.mkdir(parents=True, exist_ok=True)

        resume_stage = resume_epoch = None
        if resume:
            resume_stage, resume_epoch = self._find_resume_point(save_path)
            if resume_stage is not None:
                self._print(
                    f"Resuming from stage {resume_stage}, epoch {resume_epoch + 1}"
                )
        # the training_log.csv the reference README promises but never writes
        csv_log = CSVLogger(
            save_path / "training_log.csv",
            ["stage", "epoch", "train_loss", "val_loss", "train_dice",
             "val_dice", "train_acc", "val_acc", "base_loss",
             "uncertainty_mean", "lr", "epoch_time_s"],
        )
        from ugpg_tpu.utils.tb import TBWriter

        tb = TBWriter(self.tb_logdir)
        self._print("Starting Uncertainty-Guided Progressive Growing U-Net Training")

        stage_list = list(stages) if stages is not None else list(range(1, max_stages + 1))
        self.preempted = False
        for stage in stage_list:
            if self.preempted:
                break
            # per-stage loader dicts (AugMoNuSeg path builds one loader per
            # stage resolution, ref: train_aug_monuseg.py:196-212)
            tl = train_loader[stage] if isinstance(train_loader, dict) else train_loader
            vl = val_loader[stage] if isinstance(val_loader, dict) else val_loader
            cfg = self.stage_configs[stage]
            self._print(
                f"\nStage {stage} — {cfg['resolution']}x{cfg['resolution']}"
                + (f" (uncertainty alpha={self.uncertainty_alpha})" if stage > 1 else "")
            )
            start_epoch = 0
            if resume_stage is not None:
                if stage < resume_stage:
                    self._print(f"Resume: skipping completed stage {stage}")
                    continue
                if stage == resume_stage:
                    self.current_stage = stage
                    self.setup_optimizer(stage)
                    self._restore_last(save_path, stage)
                    start_epoch = resume_epoch + 1
                    resume_stage = None
                    if start_epoch >= cfg["epochs_per_stage"]:
                        continue
                else:
                    # the requested stage list skipped past the resume
                    # stage: its trained weights must still be loaded —
                    # otherwise transfer_weights below would seed this
                    # stage from a freshly-initialized resume stage (and
                    # use random weights as the uncertainty source)
                    for suffix in ("last", "best"):
                        ckpt = save_path / f"ug_pgunet_stage{resume_stage}_{suffix}"
                        if has_checkpoint(ckpt):
                            self.load_stage_weights(resume_stage, ckpt)
                            break
                    resume_stage = None
            if start_epoch == 0:
                if stage > 1:
                    self.transfer_weights(stage - 1, stage)
                self.current_stage = stage
                self.setup_optimizer(stage)
                self.history["stage_transitions"].append(
                    len(self.history["train_loss"])
                )
            # resumed mid-stage: the restored history already carries this
            # stage's transition marker, and the _best checkpoint's dice
            # must keep gating saves (best_val_dice=0 would let a worse
            # post-resume epoch silently overwrite the better weights)
            best_val_dice = (
                self._best_val_dice_on_disk(save_path, stage)
                if start_epoch > 0 else 0.0
            )
            for epoch in range(start_epoch, cfg["epochs_per_stage"]):
                t0 = time.time()
                (tr_loss, tr_base, tr_dice, tr_acc, tr_um, tr_us) = self.train_epoch(
                    tl, stage
                )
                (va_loss, va_base, va_dice, va_acc, va_um, va_us) = self.validate_epoch(
                    vl, stage
                )
                self.history["train_loss"].append(tr_loss)
                self.history["val_loss"].append(va_loss)
                self.history["train_dice"].append(tr_dice)
                self.history["val_dice"].append(va_dice)
                self.history["uncertainty_weights_mean"].append(va_um)
                self.history["uncertainty_weights_std"].append(va_us)
                self.history["base_loss"].append(va_base)
                csv_log.log(
                    stage=stage, epoch=epoch + 1,
                    train_loss=round(tr_loss, 6), val_loss=round(va_loss, 6),
                    train_dice=round(tr_dice, 6), val_dice=round(va_dice, 6),
                    train_acc=round(tr_acc, 6), val_acc=round(va_acc, 6),
                    base_loss=round(va_base, 6),
                    uncertainty_mean=round(va_um, 6),
                    lr=get_learning_rate(self._state.opt_state),
                    epoch_time_s=round(time.time() - t0, 3),
                )
                tb.scalars(
                    len(self.history["train_loss"]) - 1,
                    **{f"stage{stage}/train_loss": tr_loss,
                       f"stage{stage}/val_loss": va_loss,
                       f"stage{stage}/train_dice": tr_dice,
                       f"stage{stage}/val_dice": va_dice,
                       f"stage{stage}/uncertainty_mean": va_um},
                )

                self._print(
                    f"Stage {stage}, Epoch {epoch + 1}/{cfg['epochs_per_stage']} "
                    f"({time.time() - t0:.2f}s)\n"
                    f"Train - Loss: {tr_loss:.4f}, Base: {tr_base:.4f}, "
                    f"Dice: {tr_dice:.4f}, Acc: {tr_acc:.4f}\n"
                    f"Val   - Loss: {va_loss:.4f}, Base: {va_base:.4f}, "
                    f"Dice: {va_dice:.4f}, Acc: {va_acc:.4f}"
                )

                if self.nan_guard:
                    bad = nonfinite_metrics(train_loss=tr_loss, val_loss=va_loss)
                    if bad:
                        ckpt = save_path / f"ug_pgunet_stage{stage}_diverged"
                        save_checkpoint(
                            ckpt,
                            self._state.variables,
                            opt_state=self._state.opt_state,
                            metadata={
                                "stage": stage,
                                "epoch": epoch,
                                "diverged_metrics": {
                                    k: repr(v) for k, v in bad.items()
                                },
                                "history": self.history,
                            },
                            backend=self.checkpoint_backend,
                        )
                        from ugpg_tpu.io.checkpoint import wait_for_async_saves

                        wait_for_async_saves()
                        raise TrainingDivergedError(stage, epoch + 1, bad, ckpt)

                if va_dice > best_val_dice:
                    best_val_dice = va_dice
                    save_checkpoint(
                        save_path / f"ug_pgunet_stage{stage}_best",
                        self._state.variables,
                        opt_state=self._state.opt_state,
                        metadata={
                            "stage": stage,
                            "epoch": epoch,
                            "val_dice": va_dice,
                            "train_dice": tr_dice,
                            "uncertainty_alpha": self.uncertainty_alpha,
                            "history": self.history,
                        },
                        backend=self.checkpoint_backend,
                    )
                rolled = checkpoint_every and (epoch + 1) % checkpoint_every == 0
                stopping = preemption is not None and preemption.should_stop()
                if rolled or stopping:
                    save_checkpoint(
                        save_path / f"ug_pgunet_stage{stage}_last",
                        self._state.variables,
                        opt_state=self._state.opt_state,
                        metadata={
                            "stage": stage,
                            "epoch": epoch,
                            "val_dice": va_dice,
                            "uncertainty_alpha": self.uncertainty_alpha,
                            "history": self.history,
                        },
                        backend=self.checkpoint_backend,
                    )
                if stopping:
                    self.preempted = True
                    self._print(
                        f"Preemption requested (signal "
                        f"{getattr(preemption, 'signum', None)}): rolling "
                        f"checkpoint saved at stage {stage}, epoch "
                        f"{epoch + 1}; restart with resume=True to continue"
                    )
                    break
        from ugpg_tpu.io.checkpoint import wait_for_async_saves

        wait_for_async_saves()  # durable checkpoints before returning
        tb.close()
        self._print(
            "Uncertainty-guided progressive training "
            + ("preempted — resumable from the _last checkpoint"
               if self.preempted else "completed!")
        )
        self.save_training_plots(save_path)
        return self.history

    # ------------------------------------------------------------------
    def finetune_native(
        self,
        train_loader: Iterable,
        stage: int = 4,
        epochs: int = 1,
        mesh=None,
        w_axis: str | None = None,
        lr: float | None = None,
        val_loader: Iterable | None = None,
        save_dir: str | None = None,
        dtype=_UNSET,
        accum_steps: int = 1,
    ):
        """Fine-tune one stage at NATIVE slide resolution, spatially sharded.

        ``accum_steps`` defaults to ``1`` — NOT the trainer's setting —
        because native loaders canonically yield single whole slides
        (batch 1, indivisible into micro-batches), and at native
        resolution the spatial grid, not micro-batching, is the memory
        axis.  Pass ``accum_steps=K`` explicitly for multi-slide native
        batches of size divisible by ``K``.

        The progressive recipe trains at the 32→256 stage pyramid (the
        reference additionally downsizes every slide to ≤256px,
        ref: MoNuSegImprove/test_monuseg.py:164-201); this extra phase —
        impossible single-device at whole-slide sizes — continues training
        the stage on full-resolution batches with H (and, with ``w_axis``,
        W) sharded over the mesh and 1-px halo exchange in both passes
        (``parallel.spatial.make_spatial_train_step``: global-batch BN,
        global-mean loss/metrics, torch-RMSprop).

        Batches keep their native (H, W); each is cropped bottom/right to
        the grid's divisibility constraint (cropped, not zero-padded: pad
        pixels would contribute to the loss mean).  Uncertainty guidance
        keeps the frozen previous stage as its source.  On return, the
        fine-tuned weights replace ``self.variables[stage]`` (and are saved
        to ``{save_dir}/ug_pgunet_stage{stage}_native`` when ``save_dir``
        is given), so evaluation/serving pick them up directly.

        Returns a history dict with per-epoch train/val means.
        """
        from ugpg_tpu.parallel.spatial import (
            make_spatial_eval_step,
            make_spatial_train_step,
            spatial_divisor,
        )

        mesh = mesh if mesh is not None else self.mesh
        if mesh is None:
            raise ValueError(
                "finetune_native needs a mesh (e.g. parallel.mesh.make_mesh)"
            )
        # inherit the trainer's compute dtype (e.g. bf16) unless overridden —
        # native-resolution activations are exactly where bf16 matters
        dtype = self.dtype if dtype is _UNSET else dtype
        axis = "data"
        prev_stage = stage - 1 if stage > 1 else None
        tx = torch_rmsprop(
            lr if lr is not None else self.stage_configs[stage]["lr"],
            weight_decay=self.weight_decay,
        )
        variables = self._ensure_variables(stage)
        state = TrainState.create(variables, tx)
        prev_vars = self._prev_variables(stage)
        step = make_spatial_train_step(
            stage, mesh, tx, axis=axis, w_axis=w_axis,
            prev_stage=prev_stage, alpha=self.uncertainty_alpha, dtype=dtype,
            accum_steps=accum_steps,
        )
        eval_step = (
            make_spatial_eval_step(
                stage, mesh, axis=axis, w_axis=w_axis,
                prev_stage=prev_stage, alpha=self.uncertainty_alpha,
                dtype=dtype,
            )
            if val_loader is not None else None
        )
        h_div, w_div = spatial_divisor(stage, mesh, axis, w_axis)

        def crop(images, masks):
            images, masks = np.asarray(images), np.asarray(masks)
            ch = (images.shape[1] // h_div) * h_div
            cw = (images.shape[2] // w_div) * w_div
            if ch == 0 or cw == 0:
                raise ValueError(
                    f"native size {images.shape[1:3]} smaller than the grid "
                    f"divisor ({h_div}, {w_div})"
                )
            return images[:, :ch, :cw], masks[:, :ch, :cw]

        hist: dict[str, list] = {
            "train_loss": [], "train_dice": [], "val_loss": [], "val_dice": []
        }
        for epoch in range(epochs):
            t0 = time.time()
            acc = []
            # double-buffered host->HBM prefetch: slide k+1 crops+transfers
            # while the spatial step for slide k runs (native-res batches
            # are the largest transfers in the codebase)
            for batch in prefetch_to_device(
                iter(train_loader), size=2,
                put=lambda b: jax.device_put(crop(*b)),
            ):
                state, m = step(state, prev_vars, batch, self.pos_weight)
                acc.append(m)
            tr_loss = float(np.mean([float(m["final_loss"]) for m in acc]))
            tr_dice = float(np.mean([float(m["dice"]) for m in acc]))
            hist["train_loss"].append(tr_loss)
            hist["train_dice"].append(tr_dice)
            msg = (
                f"Native fine-tune stage {stage}, epoch {epoch + 1}/{epochs} "
                f"({time.time() - t0:.2f}s) — loss {tr_loss:.4f}, "
                f"dice {tr_dice:.4f}"
            )
            if eval_step is not None:
                va = [
                    eval_step(
                        state.variables, prev_vars, crop(*b), self.pos_weight
                    )
                    for b in val_loader
                ]
                va_loss = float(np.mean([float(m["final_loss"]) for m in va]))
                va_dice = float(np.mean([float(m["dice"]) for m in va]))
                hist["val_loss"].append(va_loss)
                hist["val_dice"].append(va_dice)
                msg += f"; val loss {va_loss:.4f}, dice {va_dice:.4f}"
            self._print(msg)

        self.variables[stage] = state.variables
        self._state = state
        self._tx = tx
        if save_dir is not None:
            save_checkpoint(
                Path(save_dir) / f"ug_pgunet_stage{stage}_native",
                state.variables,
                opt_state=state.opt_state,
                metadata={
                    "stage": stage,
                    "native_finetune": True,
                    "epochs": epochs,
                    "uncertainty_alpha": self.uncertainty_alpha,
                    "history": hist,
                },
                backend=self.checkpoint_backend,
            )
        return hist

    # ------------------------------------------------------------------
    @staticmethod
    def _best_val_dice_on_disk(save_path: Path, stage: int) -> float:
        """val_dice recorded in the stage's _best checkpoint (0.0 if none)."""
        import json as _json

        meta_file = save_path / f"ug_pgunet_stage{stage}_best" / "metadata.json"
        try:
            return float(_json.loads(meta_file.read_text()).get("val_dice", 0.0))
        except (OSError, ValueError):
            return 0.0

    # ------------------------------------------------------------------
    def _find_resume_point(self, save_path: Path):
        """Latest ``_last`` checkpoint -> (stage, epoch); restores earlier
        stages' weights (needed as frozen uncertainty sources)."""
        import json as _json

        last_stage = None
        for stage in (4, 3, 2, 1):
            ckpt_dir = save_path / f"ug_pgunet_stage{stage}_last"
            meta_file = ckpt_dir / "metadata.json"
            # require the DATA too: an interrupted orbax-async save can leave
            # metadata.json without a finalized array write — resume must
            # fall back to the previous complete checkpoint, not crash
            if meta_file.exists() and has_checkpoint(ckpt_dir):
                last_stage = stage
                break
        if last_stage is None:
            return None, None
        meta = _json.loads(meta_file.read_text())
        # earlier stages: prefer their best weights
        for s in range(1, last_stage):
            for suffix in ("best", "last"):
                ckpt = save_path / f"ug_pgunet_stage{s}_{suffix}"
                if has_checkpoint(ckpt):
                    self.load_stage_weights(s, ckpt)
                    break
        return last_stage, int(meta.get("epoch", -1))

    def _restore_last(self, save_path: Path, stage: int):
        """Restore variables + optimizer state + history for mid-stage resume.

        Under a mesh, restored host arrays are re-laid-out to the sharded
        state's layout — otherwise a resumed run would silently continue
        replicated/single-device."""
        ckpt = save_path / f"ug_pgunet_stage{stage}_last"
        variables, opt_state, meta = load_checkpoint(
            ckpt,
            variables_template=self._ensure_variables(stage),
            opt_state_template=self._state.opt_state,
        )
        variables = self._shard(variables)
        if opt_state is not None and self.mesh is not None:
            # match each restored leaf to the freshly-created (sharded) opt
            # state's placement
            opt_state = jax.tree.map(
                lambda tgt, val: jax.device_put(val, tgt.sharding)
                if hasattr(tgt, "sharding") else val,
                self._state.opt_state, opt_state,
            )
        self.variables[stage] = variables
        self._state = self._state.replace(
            params=variables["params"],
            batch_stats=variables.get("batch_stats", {}),
            opt_state=opt_state if opt_state is not None else self._state.opt_state,
        )
        if isinstance(meta.get("history"), dict):
            for k, v in meta["history"].items():
                if k in self.history and isinstance(v, list):
                    self.history[k] = v

    # ------------------------------------------------------------------
    def load_stage_weights(self, stage: int, checkpoint_path: str):
        """Load variables for one stage from a checkpoint dir (ref: :469-473)."""
        template = self._ensure_variables(stage)
        variables, _, _ = load_checkpoint(checkpoint_path, variables_template=template)
        self.variables[stage] = self._shard(variables)
        self._print(f"Loaded weights for stage {stage} from {checkpoint_path}")

    def save_uncertainty_analysis(self, data_loader: Iterable, stage: int, save_path):
        """Uncertainty stats JSON for the first 10 batches (ref: :475-525)."""
        if stage == 1:
            self._print("No uncertainty analysis for stage 1 (base stage)")
            return None
        from ugpg_tpu.ops.resize import resize_bilinear_align_corners
        from ugpg_tpu.uncertainty import generate_uncertainty_map

        res = self.stage_configs[stage]["resolution"]
        prev_res = self.stage_configs[stage - 1]["resolution"]
        prev_vars = self.variables[stage - 1]
        prev_module = self.modules[stage - 1]

        @jax.jit
        def unc(images):
            x = resize_bilinear_align_corners(images, (res, res))
            return generate_uncertainty_map(
                lambda xp: prev_module.apply(prev_vars, xp, False), x, prev_res, res
            )

        stats = []
        for batch_idx, batch in enumerate(data_loader):
            if batch_idx >= 10:
                break
            amap = unc(jnp.asarray(batch[0]))
            stats.append(
                {
                    "batch_idx": batch_idx,
                    "uncertainty_mean": float(jnp.mean(amap)),
                    "uncertainty_std": float(jnp.std(amap)),
                    "uncertainty_min": float(jnp.min(amap)),
                    "uncertainty_max": float(jnp.max(amap)),
                }
            )
        out = Path(save_path) / f"uncertainty_stats_stage{stage}.json"
        out.parent.mkdir(parents=True, exist_ok=True)
        out.write_text(json.dumps(stats, indent=2))
        self._print(f"Uncertainty analysis saved for stage {stage}")
        return stats

    def save_training_plots(self, save_path):
        """4-panel history plot (matplotlib-optional, ref: :400-467)."""
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt
        except ImportError:
            self._print("matplotlib not available; skipping plots")
            return None

        h = self.history
        epochs = range(len(h["train_loss"]))
        fig, ((ax1, ax2), (ax3, ax4)) = plt.subplots(2, 2, figsize=(16, 12))
        ax1.plot(epochs, h["train_loss"], label="Train Loss (Weighted)", alpha=0.7)
        ax1.plot(epochs, h["val_loss"], label="Val Loss (Weighted)", alpha=0.7)
        ax1.plot(epochs, h["base_loss"], "--", label="Base Loss (Unweighted)", alpha=0.7)
        ax1.set_title("Loss (Uncertainty-Guided)")
        ax2.plot(epochs, h["train_dice"], label="Train Dice")
        ax2.plot(epochs, h["val_dice"], label="Val Dice")
        ax2.set_title("Dice Coefficient")
        um = np.array(h["uncertainty_weights_mean"])
        us = np.array(h["uncertainty_weights_std"])
        ax3.plot(epochs, um, label="Mean Uncertainty Weight")
        if len(um):
            ax3.fill_between(epochs, um - us, um + us, alpha=0.3, label="±1 Std")
        ax3.set_title("Uncertainty Weights")
        diff = np.array(h["val_loss"]) - np.array(h["base_loss"])
        ax4.plot(epochs, diff, label="Weighted − Base", alpha=0.7)
        ax4.axhline(0, color="black", alpha=0.3)
        ax4.set_title("Impact of Uncertainty Weighting")
        for ax in (ax1, ax2, ax3, ax4):
            for t in h["stage_transitions"]:
                ax.axvline(t, color="red", linestyle="--", alpha=0.5)
            ax.set_xlabel("Epoch")
            ax.legend()
        fig.tight_layout()
        out = Path(save_path) / "uncertainty_guided_training_plots.png"
        fig.savefig(out, dpi=150, bbox_inches="tight")
        plt.close(fig)
        self._print(f"Training plots saved to {out}")
        return out

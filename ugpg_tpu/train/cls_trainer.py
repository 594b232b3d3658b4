"""HerlevTrainer: progressive classification trainer.

Host-side engine matching the reference classification trainer's behavior
(ref: Herlev/train_herlev.py:124-503):

* stage resolutions {1:32, 2:64, 3:128, 4:224} (224, not 256, at stage 4;
  ref: :134-139)
* torch-parity Adam(weight_decay) + ReduceLROnPlateau(0.5, patience 5)
  rebuilt per stage (ref: :178-194)
* class-weighted CE base loss with auto-computed inverse-frequency weights
  (ref: :170-176, herlev_dataset.py:262-280)
* classifier-head-only weight transfer between stages (exact-shape match;
  ref: :196-214)
* entropy-based sample-wise uncertainty weighting for stages > 1
  (ref: :216-296)
* best-by-val-accuracy checkpoints embedding the full config (ref: :459-480),
  early stopping (patience 15, ref: :485-487), history JSON (ref: :499-503)

On-device path: the fused cls train step runs (train) augmentation,
ImageNet normalization, the stage resize, the frozen prev-stage forward,
loss, gradients, and the Adam update inside ONE XLA program
(``make_cls_train_step(augment=..., normalize=True)``); per-batch metrics
stay on device and are fetched once per epoch (the reference syncs with
``.item()`` every batch; ref: train_herlev.py:329-337).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Any, Iterable, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.data.loader import prefetch_to_device
from ugpg_tpu.io.checkpoint import has_checkpoint, load_checkpoint, save_checkpoint
from ugpg_tpu.models.classifier import CLS_STAGE_RESOLUTIONS, HerlevClassificationModel
from ugpg_tpu.parallel.distributed import global_batch
from ugpg_tpu.parallel.mesh import shard_batch, shard_variables
from ugpg_tpu.progressive.transfer import flatten_tree, transfer_weights, unflatten_tree
from ugpg_tpu.train.optim import (
    ReduceLROnPlateau,
    freeze_subtrees,
    get_learning_rate,
    torch_adam,
)
from ugpg_tpu.train.steps import (
    TrainState,
    make_cls_eval_epoch,
    make_cls_eval_step,
    make_cls_train_epoch,
    make_cls_train_step,
    plan_epoch_chunks,
    put_stacked,
    scan_usable,
    split_epoch_keys,
    stack_epoch,
)
from ugpg_tpu.utils.anomaly import TrainingDivergedError, nonfinite_metrics
from ugpg_tpu.utils.profiling import CSVLogger

__all__ = ["HerlevTrainer", "create_config"]

_HEAD_KEYS = ("fc1", "fc2", "fc3")


def create_config() -> dict:
    """Default Herlev config (ref: train_herlev.py:506-548, paths removed)."""
    return {
        "data_dir": None,
        "binary_classification": False,
        "num_classes": 7,
        "pretrained_unet_paths": {},
        "batch_size": 16,
        "epochs_per_stage": 30,
        "stages": [1, 2, 3, 4],
        "num_workers": 4,
        "log_interval": 10,
        "early_stopping_patience": 15,
        "weight_decay": 1e-4,
        "class_weights": None,
        "uncertainty_alpha": 1.0,
        "split_ratios": {"train": 0.7, "val": 0.2, "test": 0.1},
        "output_dir": "./herlev_outputs",
    }


class HerlevTrainer:
    """Progressive trainer for Herlev cervical-cell classification."""

    def __init__(self, config: Mapping[str, Any], dtype=None, axis_name=None,
                 seed=0, mesh=None, shard_model: bool = True,
                 checkpoint_backend: str = "msgpack",
                 nan_guard: bool = True):
        """``mesh``: optional ('data', 'model') ``jax.sharding.Mesh`` — stage
        variables are sharded at stage entry, batches over 'data', and
        multi-process runs feed per-host shards (see
        ``parallel.mesh`` / ``parallel.distributed``)."""
        self.config = dict(config)
        self.mesh = mesh
        self.shard_model = shard_model
        self.checkpoint_backend = checkpoint_backend
        # fail fast on NaN/Inf epoch losses with a diagnostic checkpoint
        # (utils.anomaly); nan_guard=False trains through them
        self.nan_guard = nan_guard
        k = self.config["num_classes"]
        epochs = self.config.get("epochs_per_stage", 30)
        self.stage_configs = {
            s: {"resolution": CLS_STAGE_RESOLUTIONS[s],
                "epochs": epochs,
                "lr": 3e-4 if s == 1 else 1e-4}
            for s in (1, 2, 3, 4)
        }
        self.uncertainty_alpha = self.config.get("uncertainty_alpha", 1.0)
        self.verbose = self.config.get("verbose", True)
        self._print = print if self.verbose else (lambda *a, **kw: None)

        # remat: jax.checkpoint each encoder DoubleConv (activation
        # rematerialization) — see UncertaintyGuidedProgressiveTrainer.
        self.remat = bool(self.config.get("remat", False))
        self.modules = {
            s: HerlevClassificationModel(
                stage=s, num_classes=k, axis_name=axis_name, dtype=dtype,
                remat=self.remat,
            )
            for s in (1, 2, 3, 4)
        }
        rngs = jax.random.split(jax.random.key(seed), 5)
        self._init_rngs = {s: rngs[s - 1] for s in (1, 2, 3, 4)}
        self._drop_key = rngs[4]
        self.variables: dict[int, Any] = {}
        self.current_stage = 1

        cw = self.config.get("class_weights")
        self.class_weights = (
            jnp.asarray(cw, jnp.float32) if cw is not None else None
        )

        self._tx = None
        self._state: TrainState | None = None
        self._scheduler: ReduceLROnPlateau | None = None
        self._train_steps: dict[tuple, Any] = {}
        self._eval_steps: dict[int, Any] = {}
        self._train_epochs: dict[int, Any] = {}
        self._eval_epochs: dict[int, Any] = {}
        # per-stage device copy of a single-chunk validation epoch (see
        # _validate_epoch_scan)
        self._val_stack_cache: dict[int, Any] = {}
        # scan_epochs: fuse each epoch into one lax.scan program (one
        # dispatch + one metric fetch per epoch); identical trajectory to
        # the per-step path (same step bodies + RNG subkey sequence)
        self.scan_epochs = bool(self.config.get("scan_epochs", False))
        # cap on bytes stacked/transferred per scan dispatch (several
        # equal-length scan programs instead of one unbounded epoch stack);
        # None = unbounded
        self.scan_chunk_bytes = self.config.get("scan_chunk_bytes", 1 << 30)
        # gradient accumulation: each loader batch (size K*m) runs as K
        # sequential micro-batches inside one program, one optimizer update
        self.accum_steps = int(self.config.get("accum_steps", 1))
        if self.accum_steps < 1:
            raise ValueError(
                f"accum_steps must be >= 1, got {self.accum_steps}"
            )
        # pipeline parallelism over the frozen prev-stage uncertainty
        # forward: the LAST N visible devices run it as their own program
        # while the rest train data-parallel (parallel.pipeline; same
        # semantics/constraints as the segmentation trainer's pipeline_unc)
        self.pipeline_unc = int(self.config.get("pipeline_unc", 0))
        if self.pipeline_unc and mesh is not None:
            raise ValueError(
                "pipeline_unc and mesh are mutually exclusive: the "
                "pipeline builds its own (train, uncertainty) device "
                "split from the visible devices"
            )
        self._pipelines: dict[int, tuple] = {}

        self.history = {
            "train_loss": [], "val_loss": [],
            "train_acc": [], "val_acc": [],
            "uncertainty_weights_mean": [], "uncertainty_weights_std": [],
            "base_loss": [],
            "stage_transitions": [],
        }

        # optional pretrained segmentation encoders (ref: :51-56, :79-81)
        for s, path in (self.config.get("pretrained_unet_paths") or {}).items():
            if path and os.path.exists(str(path)):
                self.load_pretrained_unet(int(s), path)

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
            x = jnp.zeros((1, res, res, 3), jnp.float32)
            variables = self.modules[stage].init(
                self._init_rngs[stage], x, False
            )
            self.variables[stage] = self._shard(variables)
        return self.variables[stage]

    def _shard(self, variables):
        if self.mesh is None:
            return variables
        return shard_variables(variables, self.mesh, self.shard_model)

    def _as_batch(self, batch):
        if self.mesh is not None:
            if jax.process_count() > 1:
                return global_batch(
                    (np.asarray(batch[0]), np.asarray(batch[1])), self.mesh
                )
            n = np.asarray(batch[0]).shape[0]
            if n % self.mesh.shape["data"] == 0:
                return shard_batch(
                    (jnp.asarray(batch[0]), jnp.asarray(batch[1])), self.mesh
                )
            # ragged straggler batch: replicate (numerically identical,
            # just not data-parallel for this one batch)
        return jnp.asarray(batch[0]), jnp.asarray(batch[1])

    def load_pretrained_unet(self, stage: int, ckpt_path: str):
        """Merge a pretrained PGUNet checkpoint into the stage encoder and
        mark it frozen (ref: train_herlev.py:51-56, 79-81)."""
        self._print(f"Loading pretrained U-Net weights from: {ckpt_path}")
        variables = self._ensure_variables(stage)
        seg_vars, _, _ = load_checkpoint(ckpt_path)
        # nest the seg tree under the encoder scope and name-merge
        nested = {
            coll: {"unet": sub} for coll, sub in seg_vars.items()
        }
        merged, copied = transfer_weights(nested, variables)
        self.variables[stage] = merged
        self._frozen_stages = getattr(self, "_frozen_stages", set())
        self._frozen_stages.add(stage)
        self._print(f"  merged {len(copied)} encoder keys; encoder frozen")

    def setup_optimizer_scheduler(self, stage: int):
        """Adam + plateau scheduler for the stage (ref: :178-194).

        Under a mesh, variables are (re-)sharded here — stage entry — so the
        optimizer state inherits the same layout."""
        tx = torch_adam(
            self.stage_configs[stage]["lr"],
            weight_decay=self.config.get("weight_decay", 1e-4),
        )
        if stage in getattr(self, "_frozen_stages", set()):
            tx = freeze_subtrees(tx, ("unet",))
        self._tx = tx
        self.variables[stage] = self._shard(self._ensure_variables(stage))
        self._state = TrainState.create(self.variables[stage], tx)
        self._scheduler = ReduceLROnPlateau(factor=0.5, patience=5)
        # step functions close over tx; rebuild for this stage
        self._train_steps.pop(stage, None)
        self._train_epochs.pop(stage, None)
        self._pipelines.pop(stage, None)
        return tx

    def transfer_weights(self, prev_stage: int, current_stage: int):
        """Classifier-head-only transfer on exact shape match (ref: :196-214)."""
        self._print(f"Transferring weights from stage {prev_stage} to {current_stage}")
        prev_vars = self._ensure_variables(prev_stage)
        if self.pipeline_unc:
            # after a pipelined stage the trained variables live replicated
            # on the pipeline's train mesh while the new stage inits on the
            # default device — one jitted program cannot mix the two device
            # sets, so normalize through the host (small trees, stage entry
            # only)
            prev_vars = jax.device_get(prev_vars)
        prev = flatten_tree(prev_vars)
        cur = dict(flatten_tree(self._ensure_variables(current_stage)))
        copied = 0
        for path, pv in prev.items():
            if len(path) >= 2 and path[1] in _HEAD_KEYS and path in cur:
                if pv.shape == cur[path].shape:
                    cur[path] = jnp.copy(pv)
                    copied += 1
        self.variables[current_stage] = unflatten_tree(cur)
        self._print(f"  Transferred {copied} classifier tensors")

    # ------------------------------------------------------------------
    def _get_train_step(self, stage: int):
        if self._tx is None or self._state is None:
            self.setup_optimizer_scheduler(stage)
        if stage not in self._train_steps:
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = (
                self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            )
            base = make_cls_train_step(
                self.modules[stage],
                self._tx,
                stage,
                self.stage_configs[stage]["resolution"],
                self.config["num_classes"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                augment=bool(self.config.get("augment", True)),
                normalize=True,
                accum_steps=self.accum_steps,
            )
            self._train_steps[stage] = base
        return self._train_steps[stage]

    def _get_eval_step(self, stage: int):
        if stage not in self._eval_steps:
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = (
                self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            )
            self._eval_steps[stage] = make_cls_eval_step(
                self.modules[stage],
                stage,
                self.stage_configs[stage]["resolution"],
                self.config["num_classes"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                normalize=True,
            )
        return self._eval_steps[stage]

    def _get_train_epoch(self, stage: int):
        self._get_train_step(stage)  # ensures optimizer/state exist
        if stage not in self._train_epochs:
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = (
                self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            )
            self._train_epochs[stage] = make_cls_train_epoch(
                self.modules[stage],
                self._tx,
                stage,
                self.stage_configs[stage]["resolution"],
                self.config["num_classes"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                augment=bool(self.config.get("augment", True)),
                normalize=True,
                accum_steps=self.accum_steps,
            )
        return self._train_epochs[stage]

    def _get_eval_epoch(self, stage: int):
        if stage not in self._eval_epochs:
            prev_module = self.modules.get(stage - 1) if stage > 1 else None
            prev_res = (
                self.stage_configs[stage - 1]["resolution"] if stage > 1 else None
            )
            self._eval_epochs[stage] = make_cls_eval_epoch(
                self.modules[stage],
                stage,
                self.stage_configs[stage]["resolution"],
                self.config["num_classes"],
                prev_module=prev_module,
                prev_resolution=prev_res,
                alpha=self.uncertainty_alpha,
                normalize=True,
            )
        return self._eval_epochs[stage]

    def _prev_variables(self, stage: int):
        if stage <= 1:
            return {}
        if self.pipeline_unc and stage in self._pipelines:
            # eval/train state lives on the pipeline's train mesh: the
            # frozen prev tree must share that device set (third cache
            # entry, same rule as the segmentation trainer)
            return self._pipelines[stage][2]
        return self._ensure_variables(stage - 1)

    def _get_pipeline(self, stage: int):
        """(UncertaintyPipeline, prev-on-unc-group, prev-on-train-mesh) for a
        stage > 1.  Built at the stage's first training epoch — after
        transfer_weights and setup_optimizer_scheduler — so the pipeline
        closes over the stage's optimizer and the previous stage's FINAL
        weights."""
        if stage not in self._pipelines:
            from jax.sharding import NamedSharding, PartitionSpec

            from ugpg_tpu.parallel.pipeline import UncertaintyPipeline

            if self._tx is None or self._state is None:
                self.setup_optimizer_scheduler(stage)
            pipe = UncertaintyPipeline(
                self.modules[stage],
                self.modules[stage - 1],
                self._tx,
                stage,
                self.stage_configs[stage]["resolution"],
                self.stage_configs[stage - 1]["resolution"],
                task_type="classification",
                num_classes=self.config["num_classes"],
                n_unc=self.pipeline_unc,
                alpha=self.uncertainty_alpha,
                augment=bool(self.config.get("augment", True)),
                normalize=True,
                accum_steps=self.accum_steps,
            )
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
        """Pipelined epoch: the frozen prev-stage forward runs on its own
        device group one batch ahead of the train step (same RNG subkey
        stream as the per-step path, so trajectories match to GSPMD
        rounding)."""
        from jax.sharding import NamedSharding, PartitionSpec

        pipe, prev, _ = self._get_pipeline(stage)
        # (re-)place the state on the pipeline's train mesh: no-op when it
        # already lives there (every epoch after the first)
        repl = NamedSharding(pipe.train_mesh, PartitionSpec())
        self._state = jax.tree.map(
            lambda x: jax.device_put(x, repl), self._state
        )
        self._drop_key, subs = split_epoch_keys(self._drop_key, len(batches))
        self._state, metrics = pipe.run_epoch(
            self._state, prev, batches, self.class_weights, list(subs)
        )
        self.variables[stage] = self._state.variables
        for m in metrics:
            m.pop("logits", None)
        return self._reduce_epoch(metrics)

    def _train_epoch_pipelined_scan(self, batches: list, stage: int):
        """scan_epochs × pipeline_unc: chunk-level pipelining — the unc
        group produces a stacked block of per-sample weights per chunk
        while the train group scans the previous chunk (same RNG subkey
        stream as every other path; parallel.pipeline.run_epoch_scan)."""
        from jax.sharding import NamedSharding, PartitionSpec

        pipe, prev, _ = self._get_pipeline(stage)
        repl = NamedSharding(pipe.train_mesh, PartitionSpec())
        self._state = jax.tree.map(
            lambda x: jax.device_put(x, repl), self._state
        )
        self._drop_key, subs = split_epoch_keys(self._drop_key, len(batches))
        self._state, parts, tail_metrics = pipe.run_epoch_scan(
            self._state, prev, batches, self.class_weights, subs,
            chunk_bytes=self.scan_chunk_bytes,
        )
        self.variables[stage] = self._state.variables
        tail_metrics = [dict(m) for m in tail_metrics]
        for m in tail_metrics:
            m.pop("logits", None)
        return self._combine_cls_scan(parts, tail_metrics)

    @staticmethod
    def _reduce_epoch(metrics_list):
        """One host fetch for the whole epoch's device-resident metrics."""
        ms = jax.device_get(metrics_list)
        n = max(len(ms), 1)
        correct = sum(int(m["correct"]) for m in ms)
        count = max(sum(int(m["count"]) for m in ms), 1)
        return (
            sum(float(m["final_loss"]) for m in ms) / n,
            sum(float(m["base_loss"]) for m in ms) / n,
            100.0 * correct / count,
            sum(float(m["uncertainty_weight_mean"]) for m in ms) / n,
            sum(float(m["uncertainty_weight_std"]) for m in ms) / n,
        )

    def _combine_cls_scan(self, parts: list, tail_metrics: list):
        """Merge the scanned chunks (``(mean_metrics, n_steps)`` pairs:
        means + summed correct/count) with the ragged tail's per-step
        metrics; ONE host fetch."""
        parts, tm = jax.device_get((parts, tail_metrics))
        n_total = sum(n for _, n in parts) + len(tm)
        correct = sum(int(mm["correct"]) for mm, _ in parts) + sum(
            int(m["correct"]) for m in tm
        )
        count = max(
            sum(int(mm["count"]) for mm, _ in parts)
            + sum(int(m["count"]) for m in tm),
            1,
        )

        def wmean(k):
            return (
                sum(float(mm[k]) * n for mm, n in parts)
                + sum(float(m[k]) for m in tm)
            ) / n_total

        return (
            wmean("final_loss"),
            wmean("base_loss"),
            100.0 * correct / count,
            wmean("uncertainty_weight_mean"),
            wmean("uncertainty_weight_std"),
        )

    def _scan_possible(self) -> bool:
        """Cheap pre-check BEFORE materializing the epoch (multi-process
        mesh feeding is per-batch; see seg_trainer._scan_possible)."""
        return self.mesh is None or jax.process_count() == 1

    def _train_epoch_scan(self, batches: list, stage: int):
        if not scan_usable(batches[0], self.mesh):
            return None  # checked before stacking: no wasted epoch copy
        ranges, tail_start = plan_epoch_chunks(batches, self.scan_chunk_bytes)
        tail = batches[tail_start:]
        epoch_fn = self._get_train_epoch(stage)
        prev_vars = self._prev_variables(stage)
        cw = self.class_weights
        self._drop_key, subs = split_epoch_keys(self._drop_key, len(batches))
        parts = []
        for a, b in ranges:
            # stack + transfer one bounded chunk at a time
            stacked, _ = stack_epoch(batches[a:b])
            self._state, mean_metrics = epoch_fn(
                self._state, prev_vars, put_stacked(stacked, self.mesh), cw,
                subs[a:b],
            )
            parts.append((mean_metrics, b - a))
        tail_metrics = []
        if tail:
            step_fn = self._get_train_step(stage)
            for i, b in enumerate(tail):
                self._state, m = step_fn(
                    self._state, prev_vars, self._as_batch(b), cw,
                    subs[tail_start + i],
                )
                m.pop("logits", None)
                tail_metrics.append(m)
        self.variables[stage] = self._state.variables
        return self._combine_cls_scan(parts, tail_metrics)

    def _validate_epoch_scan(self, batches: list, stage: int,
                             cache_token=None):
        """``cache_token``: single-chunk tail-less validation epochs cache
        their stacked device copy per stage (validation sets are static
        across epochs; see seg_trainer._validate_epoch_scan)."""
        if not scan_usable(batches[0], self.mesh):
            return None  # checked before stacking: no wasted epoch copy
        ranges, tail_start = plan_epoch_chunks(batches, self.scan_chunk_bytes)
        tail = batches[tail_start:]
        epoch_fn = self._get_eval_epoch(stage)
        prev_vars = self._prev_variables(stage)
        variables = (
            self._state.variables if self._state else self._ensure_variables(stage)
        )
        cw = self.class_weights
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
            mean_metrics = epoch_fn(variables, prev_vars, dev, cw)
            parts.append((mean_metrics, b - a))
        tail_metrics = []
        if tail:
            step_fn = self._get_eval_step(stage)
            for b in tail:
                m = dict(step_fn(variables, prev_vars, self._as_batch(b), cw))
                m.pop("logits", None)
                tail_metrics.append(m)
        return self._combine_cls_scan(parts, tail_metrics)

    # ------------------------------------------------------------------
    def train_epoch(self, dataloader: Iterable, stage: int):
        if self.pipeline_unc and stage > 1:
            batches = list(dataloader)
            if not batches:
                return (0.0, 0.0, 0.0, 0.0, 0.0)
            if self.scan_epochs:
                return self._train_epoch_pipelined_scan(batches, stage)
            return self._train_epoch_pipelined(batches, stage)
        if self.scan_epochs and self._scan_possible():
            batches = list(dataloader)
            if not batches:
                return (0.0, 0.0, 0.0, 0.0, 0.0)
            out = self._train_epoch_scan(batches, stage)
            if out is not None:
                return out
            dataloader = batches  # fall through to the per-step path
        step_fn = self._get_train_step(stage)
        prev_vars = self._prev_variables(stage)
        cw = self.class_weights
        log_every = self.config.get("log_interval", 10)
        collected = []
        # double-buffered host->HBM prefetch (shards under a mesh)
        batches = prefetch_to_device(iter(dataloader), size=2, put=self._as_batch)
        for batch_idx, batch_dev in enumerate(batches):
            self._drop_key, dk = jax.random.split(self._drop_key)
            self._state, m = step_fn(self._state, prev_vars, batch_dev, cw, dk)
            m.pop("logits", None)
            collected.append(m)  # device arrays; no per-batch host sync
            if self.verbose and batch_idx % log_every == 0:
                self._print(
                    f"Stage {stage}, Batch {batch_idx} "
                    f"Loss: {float(m['final_loss']):.6f} "
                    f"Base: {float(m['base_loss']):.6f}"
                )
        self.variables[stage] = self._state.variables
        return self._reduce_epoch(collected)

    def validate_epoch(self, dataloader: Iterable, stage: int):
        if self.scan_epochs and self._scan_possible():
            batches = list(dataloader)
            if not batches:
                return (0.0, 0.0, 0.0, 0.0, 0.0)
            out = self._validate_epoch_scan(
                batches, stage, cache_token=id(dataloader)
            )
            if out is not None:
                return out
            dataloader = batches
        step_fn = self._get_eval_step(stage)
        prev_vars = self._prev_variables(stage)
        variables = (
            self._state.variables if self._state else self._ensure_variables(stage)
        )
        cw = self.class_weights
        collected = []
        batches = prefetch_to_device(iter(dataloader), size=2, put=self._as_batch)
        for batch_dev in batches:
            m = dict(step_fn(variables, prev_vars, batch_dev, cw))
            m.pop("logits", None)
            collected.append(m)
        return self._reduce_epoch(collected)

    # ------------------------------------------------------------------
    def train_progressive(self, train_loaders, val_loaders, save_dir: str,
                          preemption=None, resume: bool = False):
        """Stage loop with early stopping + best-acc checkpoints (ref: :404-503).

        ``preemption`` (``utils.preemption.PreemptionGuard``): polled at each
        epoch boundary; when armed, saves a ``herlev_stage{S}_last``
        checkpoint (variables + optimizer state + epoch + scheduler/early-
        stop state + history + config) and returns early.

        ``resume=True`` restores the latest ``_last`` checkpoint from
        ``save_dir`` and continues mid-stage exactly where the preempted run
        stopped (same optimizer/scheduler/early-stopping state; earlier
        stages' weights reloaded so the frozen uncertainty source is the
        trained one, not a fresh init)."""
        os.makedirs(save_dir, exist_ok=True)
        resume_stage = resume_meta = None
        if resume:
            resume_stage, resume_meta = self._find_resume_point(Path(save_dir))
            if resume_stage is not None:
                self._print(
                    f"Resuming from stage {resume_stage}, "
                    f"epoch {resume_meta.get('epoch', 0) + 1}"
                )
        csv_log = CSVLogger(
            Path(save_dir) / "training_log.csv",
            ["stage", "epoch", "train_loss", "val_loss", "train_acc",
             "val_acc", "base_loss", "uncertainty_mean", "lr"],
        )
        from ugpg_tpu.utils.tb import TBWriter

        tb = TBWriter(self.config.get("tb_logdir"))
        self.preempted = False
        for stage in self.config["stages"]:
            if self.preempted:
                break
            cfg = self.stage_configs[stage]
            start_epoch = 0
            best_val_acc = 0.0
            best_val_loss = float("inf")
            epochs_without_improvement = 0
            saved_any = False
            if resume_stage is not None:
                if stage < resume_stage:
                    self._print(f"Resume: skipping completed stage {stage}")
                    continue
                if stage == resume_stage:
                    self._print(
                        f"\nResuming Stage {stage} - Resolution: {cfg['resolution']}"
                    )
                    self.current_stage = stage
                    self.setup_optimizer_scheduler(stage)
                    self._restore_last(Path(save_dir), stage, resume_meta)
                    # metadata "epoch" is the 1-based count of completed
                    # epochs == the 0-based index of the next one
                    start_epoch = int(resume_meta.get("epoch", 0))
                    best_val_acc = float(resume_meta.get("best_val_acc", 0.0))
                    best_val_loss = float(
                        resume_meta.get("best_val_loss", float("inf"))
                    )
                    epochs_without_improvement = int(
                        resume_meta.get("epochs_without_improvement", 0)
                    )
                    saved_any = bool(resume_meta.get("saved_any", True))
                    resume_stage = None
                    if start_epoch >= cfg["epochs"]:
                        self.history["stage_transitions"].append(
                            {"stage": stage, "best_val_acc": best_val_acc,
                             "best_val_loss": best_val_loss}
                        )
                        continue
                else:
                    # the requested stage list skipped past the resume
                    # stage: load its trained weights anyway — transfer and
                    # the frozen uncertainty forward must not see a fresh
                    # init in its place
                    for suffix in ("last", "best"):
                        ckpt = Path(save_dir) / f"herlev_stage{resume_stage}_{suffix}"
                        if has_checkpoint(ckpt):
                            self.load_stage_weights(resume_stage, ckpt)
                            break
                    resume_stage = None
            if start_epoch == 0:
                self._print(f"\nTraining Stage {stage} - Resolution: {cfg['resolution']}")
                self.current_stage = stage
                # transfer BEFORE the optimizer build (seg_trainer order): the
                # single TrainState.create then sees the transferred variables —
                # the old order built and immediately discarded a full opt state
                if stage > 1:
                    self.transfer_weights(stage - 1, stage)
                self.setup_optimizer_scheduler(stage)

            tl = train_loaders[stage] if isinstance(train_loaders, dict) else train_loaders
            vl = val_loaders[stage] if isinstance(val_loaders, dict) else val_loaders

            for epoch in range(start_epoch, cfg["epochs"]):
                tr_loss, tr_base, tr_acc, tr_um, tr_us = self.train_epoch(tl, stage)
                va_loss, va_base, va_acc, va_um, va_us = self.validate_epoch(vl, stage)

                # the lr THIS epoch trained with — read before the plateau
                # step below possibly reduces it (logging after would
                # misattribute the reduction one epoch early)
                epoch_lr = get_learning_rate(self._state.opt_state)
                # plateau scheduler on val loss (ref: :439)
                self._state = self._state.replace(
                    opt_state=self._scheduler.step(va_loss, self._state.opt_state)
                )

                self.history["train_loss"].append(tr_loss)
                self.history["val_loss"].append(va_loss)
                self.history["train_acc"].append(tr_acc)
                self.history["val_acc"].append(va_acc)
                self.history["uncertainty_weights_mean"].append(va_um)
                self.history["uncertainty_weights_std"].append(va_us)
                self.history["base_loss"].append(va_base)
                csv_log.log(
                    stage=stage, epoch=epoch + 1,
                    train_loss=round(tr_loss, 6), val_loss=round(va_loss, 6),
                    train_acc=round(tr_acc, 4), val_acc=round(va_acc, 4),
                    base_loss=round(va_base, 6),
                    uncertainty_mean=round(va_um, 6),
                    lr=epoch_lr,
                )
                tb.scalars(
                    len(self.history["train_loss"]) - 1,
                    **{f"stage{stage}/train_loss": tr_loss,
                       f"stage{stage}/val_loss": va_loss,
                       f"stage{stage}/train_acc": tr_acc,
                       f"stage{stage}/val_acc": va_acc},
                )

                self._print(
                    f"Stage {stage} Epoch {epoch + 1}/{cfg['epochs']} | "
                    f"Train {tr_loss:.4f}/{tr_acc:.2f}% | "
                    f"Val {va_loss:.4f}/{va_acc:.2f}%"
                )

                if self.nan_guard:
                    bad = nonfinite_metrics(train_loss=tr_loss, val_loss=va_loss)
                    if bad:
                        ckpt = Path(save_dir) / f"herlev_stage{stage}_diverged"
                        save_checkpoint(
                            ckpt,
                            self._state.variables,
                            opt_state=self._state.opt_state,
                            backend=self.checkpoint_backend,
                            metadata={
                                "stage": stage,
                                "epoch": epoch + 1,
                                "diverged_metrics": {
                                    k: repr(v) for k, v in bad.items()
                                },
                                "history": self.history,
                            },
                        )
                        from ugpg_tpu.io.checkpoint import wait_for_async_saves

                        wait_for_async_saves()
                        raise TrainingDivergedError(stage, epoch + 1, bad, ckpt)

                # strict > like the reference, but guarantee at least one
                # checkpoint per stage (a 0.0% first epoch would otherwise
                # never save)
                if va_acc > best_val_acc or not saved_any:
                    best_val_acc = max(best_val_acc, va_acc)
                    best_val_loss = va_loss
                    epochs_without_improvement = 0
                    saved_any = True
                    save_checkpoint(
                        Path(save_dir) / f"herlev_stage{stage}_best",
                        self._state.variables,
                        opt_state=self._state.opt_state,
                        backend=self.checkpoint_backend,
                        metadata={
                            "stage": stage,
                            "epoch": epoch + 1,
                            "train_loss": tr_loss,
                            "val_loss": va_loss,
                            "train_acc": tr_acc,
                            "val_acc": va_acc,
                            "config": {
                                k: v for k, v in self.config.items()
                                if isinstance(v, (int, float, str, bool, list, dict, type(None)))
                            },
                        },
                    )
                    self._print(f"New best model saved! Val Acc: {va_acc:.2f}%")
                else:
                    epochs_without_improvement += 1

                # preemption FIRST: even if early stopping also fires this
                # epoch, a pending SIGTERM must still be acknowledged (save
                # the resumable checkpoint + stop the stage loop) — the
                # scheduler's grace period won't survive another stage
                if preemption is not None and preemption.should_stop():
                    self.preempted = True
                    save_checkpoint(
                        Path(save_dir) / f"herlev_stage{stage}_last",
                        self._state.variables,
                        opt_state=self._state.opt_state,
                        backend=self.checkpoint_backend,
                        metadata={
                            "stage": stage,
                            "epoch": epoch + 1,
                            "val_acc": va_acc,
                            "val_loss": va_loss,
                            "best_val_acc": best_val_acc,
                            "best_val_loss": best_val_loss,
                            "epochs_without_improvement": epochs_without_improvement,
                            "saved_any": saved_any,
                            "scheduler": {
                                "best": self._scheduler.best,
                                "num_bad_epochs": self._scheduler.num_bad_epochs,
                            },
                            "history": self.history,
                            "config": {
                                k: v for k, v in self.config.items()
                                if isinstance(v, (int, float, str, bool, list, dict, type(None)))
                            },
                        },
                    )
                    self._print(
                        f"Preemption requested (signal "
                        f"{getattr(preemption, 'signum', None)}): "
                        f"herlev_stage{stage}_last saved at epoch {epoch + 1}; "
                        f"restart with resume=True (--resume) to continue"
                    )
                    break

                if epochs_without_improvement >= self.config.get(
                    "early_stopping_patience", 15
                ):
                    self._print(
                        f"Early stopping after {epochs_without_improvement} "
                        "epochs without improvement"
                    )
                    break

            self.history["stage_transitions"].append(
                {"stage": stage, "best_val_acc": best_val_acc,
                 "best_val_loss": best_val_loss}
            )
            self._print(f"Stage {stage} completed. Best Val Acc: {best_val_acc:.2f}%")

        from ugpg_tpu.io.checkpoint import wait_for_async_saves

        wait_for_async_saves()  # durable checkpoints before returning
        tb.close()
        hist_path = os.path.join(save_dir, "training_history.json")
        with open(hist_path, "w") as f:
            json.dump(self.history, f, indent=2)
        self._print(f"Training history saved to: {hist_path}")
        return self.history

    # ------------------------------------------------------------------
    def load_stage_weights(self, stage: int, checkpoint_path):
        """Load one stage's variables from a checkpoint directory."""
        template = self._ensure_variables(stage)
        variables, _, _ = load_checkpoint(
            checkpoint_path, variables_template=template
        )
        self.variables[stage] = self._shard(variables)
        self._print(f"Loaded weights for stage {stage} from {checkpoint_path}")

    def _find_resume_point(self, save_path: Path):
        """Latest ``herlev_stage{S}_last`` checkpoint -> (stage, metadata);
        reloads earlier stages' weights (the frozen uncertainty sources)."""
        stages = sorted(self.config["stages"])
        last_stage = meta = None
        for stage in reversed(stages):
            ckpt_dir = save_path / f"herlev_stage{stage}_last"
            meta_file = ckpt_dir / "metadata.json"
            # require the DATA too: an interrupted async save can leave
            # metadata.json without a finalized array write — resume must
            # fall back to the previous complete checkpoint, not crash
            if meta_file.exists() and has_checkpoint(ckpt_dir):
                last_stage = stage
                meta = json.loads(meta_file.read_text())
                break
        if last_stage is None:
            return None, None
        for s in (s for s in stages if s < last_stage):
            for suffix in ("best", "last"):
                ckpt = save_path / f"herlev_stage{s}_{suffix}"
                if has_checkpoint(ckpt):
                    self.load_stage_weights(s, ckpt)
                    break
        return last_stage, meta

    def _restore_last(self, save_path: Path, stage: int, meta: Mapping):
        """Restore variables + optimizer + scheduler state for mid-stage
        resume.  Under a mesh, restored host arrays are re-laid-out to the
        sharded state's placement (same rule as the seg trainer)."""
        ckpt = save_path / f"herlev_stage{stage}_last"
        variables, opt_state, _ = load_checkpoint(
            ckpt,
            variables_template=self._ensure_variables(stage),
            opt_state_template=self._state.opt_state,
        )
        variables = self._shard(variables)
        if opt_state is not None and self.mesh is not None:
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
        sched = meta.get("scheduler") or {}
        if self._scheduler is not None and sched:
            self._scheduler.best = float(sched.get("best", float("inf")))
            self._scheduler.num_bad_epochs = int(sched.get("num_bad_epochs", 0))
        if isinstance(meta.get("history"), dict):
            for k, v in meta["history"].items():
                if k in self.history and isinstance(v, list):
                    self.history[k] = v

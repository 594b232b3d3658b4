"""Device mesh + sharding: the framework's distribution layer.

The reference is strictly single-process single-device (exhaustive check in
SURVEY.md §2h: no torch.distributed/NCCL/DDP anywhere; device is a string
flag, ref: uncertainty_guided_trainer.py:35).  This module is therefore a
NEW capability, designed TPU-first:

* a 2-D ``(data, model)`` ``jax.sharding.Mesh`` over ICI
* batch sharded over ``data`` (pure DP scales to a full v5e slice);
  optionally the widest conv kernels (256..1024 channels at the 16x16
  bottleneck) shard over ``model`` (TP) — SURVEY §2h flags this as the only
  TP-worthy cut for a <40M-param CNN
* the SAME fused train step compiles under ``jit`` with shardings: XLA
  inserts the gradient all-reduces / weight all-gathers over ICI (GSPMD);
  no hand-written collectives, no NCCL translation
* BatchNorm under GSPMD is cross-replica by construction: batch-dim
  reductions are global-batch semantics, so XLA emits the psum — i.e.
  sync-BN for free (SURVEY §7 hard-part #2)

Expert parallelism is deliberately n/a for this model family (no experts).
Sequence parallelism's analog is the spatial halo grid (parallel/spatial.py)
and pipeline parallelism's is the frozen prev-stage uncertainty forward
running on its own device group (parallel/pipeline.py) — SURVEY §2h.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "param_shardings",
    "shard_variables",
    "shard_batch",
    "shard_stacked_batch",
]

# Conv kernels at least this wide on the output-channel axis get TP-sharded.
_TP_MIN_CHANNELS = 256


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices=None,
) -> Mesh:
    """(data, model) mesh over the available devices (ICI-contiguous order)."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is None:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use > len(devices):
        raise ValueError(
            f"mesh ({n_data} data x {n_model} model = {use} devices) "
            f"exceeds the {len(devices)} visible device(s); on CPU set "
            "XLA_FLAGS=--xla_force_host_platform_device_count=N to simulate"
        )
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis split over 'data'."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _leaf_spec(path: tuple, leaf, mesh: Mesh, shard_model: bool) -> P:
    if not shard_model or mesh.shape["model"] == 1:
        return P()
    shape = getattr(leaf, "shape", ())
    names = [getattr(p, "key", str(p)) for p in path]
    # conv kernels (kh, kw, in, out): shard wide output channels over
    # 'model'.  'wq' is the int8-quantized kernel (ops/quant.py) — its
    # per-output-channel scale vector shards implicitly with the channels
    # it scales (the epilogue is pointwise on the sharded channel axis;
    # GSPMD slices the tiny replicated scale per shard).
    if (
        len(shape) == 4
        and names
        and names[-1] in ("kernel", "wq")
        and shape[-1] >= _TP_MIN_CHANNELS
        and shape[-1] % mesh.shape["model"] == 0
    ):
        return P(None, None, None, "model")
    # matching 1-D per-channel tensors (bias/BN scale/stats) of sharded convs
    # stay replicated: they're tiny, and XLA re-shards as needed.
    return P()


def param_shardings(
    variables: Mapping[str, Any], mesh: Mesh, shard_model: bool = True
):
    """NamedSharding pytree for a variable tree (params + batch_stats)."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(variables)
    specs = [
        NamedSharding(mesh, _leaf_spec(path, leaf, mesh, shard_model))
        for path, leaf in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, specs)


def shard_variables(variables, mesh: Mesh, shard_model: bool = True):
    """device_put a variable tree with TP/replicated layout."""
    return jax.device_put(variables, param_shardings(variables, mesh, shard_model))


def shard_batch(batch, mesh: Mesh):
    """device_put a (host) batch with the leading axis split over 'data'."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def shard_stacked_batch(batch, mesh: Mesh):
    """device_put a stacked epoch ``(S, B, ...)`` with axis 1 (the per-step
    batch axis) split over 'data' — the layout ``lax.scan`` epoch programs
    consume (each scan step sees a 'data'-sharded ``(B, ...)`` slice)."""
    sh = NamedSharding(mesh, P(None, "data"))
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)

"""Multi-host (multi-slice) runtime initialization.

Single-host multi-chip needs nothing: ``jax.devices()`` already sees the
whole slice and ``parallel.mesh`` shards over it.  Across hosts, call
``initialize()`` once per process before any jax op; XLA then runs one SPMD
program over all hosts' devices, with collectives riding ICI inside a slice
and DCN between slices.  Data loading composes with ``host_batch_slice``:
each host feeds only its shard of the global batch
(``jax.make_array_from_process_local_data`` assembles the global array).

This is a NEW capability relative to the reference (strictly single-process,
SURVEY §2h); kept dependency-light so it is importable on a laptop.
"""

from __future__ import annotations

import os

import jax
import numpy as np

__all__ = ["initialize", "is_multi_host", "host_batch_slice", "global_batch"]


def _cluster_initialized() -> bool:
    """Whether jax.distributed.initialize already ran in this process.

    Checked WITHOUT touching ``jax.process_count()``/``jax.devices()``:
    those initialize the XLA backend as a side effect, after which
    ``jax.distributed.initialize`` unconditionally raises ("must be called
    before any JAX calls") — i.e. a process_count-based guard would brick
    the exact multi-host path this module exists for.
    """
    try:
        from jax._src.distributed import global_state

        return global_state.client is not None
    except Exception:
        return False  # private API moved: assume uninitialized


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """jax.distributed.initialize with env-var fallbacks (no-op if already
    initialized or clearly single-process).  Must run before any other JAX
    call in the process (JAX requirement)."""
    if _cluster_initialized():
        return  # already initialized
    coordinator_address = coordinator_address or os.environ.get(
        "UGPG_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and num_processes is None:
        return  # single process; nothing to do
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def is_multi_host() -> bool:
    return jax.process_count() > 1


def host_batch_slice(global_batch_size: int) -> slice:
    """This process's contiguous slice of the global batch.

    Raises on indivisible sizes — silently flooring would drop the last
    ``global_batch_size % process_count`` samples from EVERY batch.
    """
    n = jax.process_count()
    if global_batch_size % n:
        raise ValueError(
            f"global batch {global_batch_size} not divisible by "
            f"{n} processes; pad or resize the batch"
        )
    per_host = global_batch_size // n
    start = jax.process_index() * per_host
    return slice(start, start + per_host)


def global_batch(local_arrays, mesh):
    """Assemble per-host local numpy batches into global sharded arrays
    (batch axis over the 'data' mesh axis)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharding = NamedSharding(mesh, P("data"))
    return jax.tree.map(
        lambda a: jax.make_array_from_process_local_data(sharding, np.asarray(a)),
        local_arrays,
    )

"""Checkpoint save/load with the reference's metadata schema.

The reference saves torch dicts like ``{stage, epoch, model_state_dict,
optimizer_state_dict, val_dice, train_dice, uncertainty_alpha, history}``
(ref: uncertainty_guided_trainer.py:384-393) under names
``ug_pgunet_stage{N}_best.pth`` and loads them with stage sniffing — a raw
state-dict is assumed stage 4 (ref: test_monuseg.py:124-138).

Here a checkpoint is a directory: ``variables.msgpack`` (flax msgpack of the
model variable tree), optional ``opt_state.msgpack``, and ``metadata.json``
(everything scalar: stage, epoch, metrics, alpha, history, config).  The
loader sniffs stage from metadata and falls back to stage 4 for bare
variable files, mirroring the reference's loader semantics.

Two storage backends share that directory layout and metadata schema:

* ``backend="msgpack"`` (default): single-file flax msgpack — zero extra
  dependencies, fine for single-host checkpoints of this model family.
* ``backend="orbax"``: `orbax.checkpoint` PyTree storage (the production
  JAX checkpoint library: sharded-array aware, atomic finalization).  The
  loader auto-detects whichever backend wrote the directory, so trainers,
  evaluators, and the serving Predictor read either transparently.
* ``backend="orbax-async"``: same storage, saved by a background
  ``AsyncCheckpointer`` — the train loop continues while the previous
  checkpoint flushes (call ``wait_for_async_saves()`` before reading a
  just-written checkpoint or exiting; ``load_checkpoint`` does it
  automatically).
"""

from __future__ import annotations

import json
import os
import shutil
from pathlib import Path
from typing import Any, Mapping

import jax
import numpy as np
from flax import serialization

__all__ = ["save_checkpoint", "load_checkpoint", "sniff_stage",
           "latest_checkpoint", "has_checkpoint", "wait_for_async_saves"]

_ORBAX_VARS = "variables_orbax"
_ORBAX_OPT = "opt_state_orbax"

_ASYNC_CKPTRS: dict = {}


def _orbax_checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def _orbax_async_checkpointer(kind: str):
    # one AsyncCheckpointer per payload kind: saving opt_state must not
    # block on the variables flush started a moment earlier (waits are
    # per-checkpointer)
    if kind not in _ASYNC_CKPTRS:
        import orbax.checkpoint as ocp

        _ASYNC_CKPTRS[kind] = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ASYNC_CKPTRS[kind]


def wait_for_async_saves() -> None:
    """Block until all in-flight orbax-async checkpoint writes finalize."""
    for ckptr in _ASYNC_CKPTRS.values():
        ckptr.wait_until_finished()


def has_checkpoint(path: str | os.PathLike) -> bool:
    """True if ``path`` holds a checkpoint from either backend."""
    p = Path(path)
    return (p / "variables.msgpack").exists() or (p / _ORBAX_VARS).exists()


def _to_py(obj):
    """Make metadata JSON-serializable (numpy scalars -> python)."""
    if isinstance(obj, dict):
        return {k: _to_py(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_py(v) for v in obj]
    if isinstance(obj, (np.generic,)):
        return obj.item()
    if hasattr(obj, "item") and getattr(obj, "ndim", None) == 0:
        return obj.item()
    return obj


def _orbax_save(target: Path, tree, async_save: bool = False,
                kind: str = "vars") -> None:
    if async_save:
        # the previous write of this KIND must finalize before we
        # delete/replace its directory (waits are per-checkpointer, so
        # variables and opt_state flush concurrently)
        _orbax_async_checkpointer(kind).wait_until_finished()
    if target.exists():
        shutil.rmtree(target)  # overwrite semantics matching the msgpack path
    if async_save:
        _orbax_async_checkpointer(kind).save(target.resolve(), tree)
    else:
        _orbax_checkpointer().save(target.resolve(), tree)


def save_checkpoint(
    path: str | os.PathLike,
    variables: Mapping[str, Any],
    opt_state: Any = None,
    metadata: Mapping[str, Any] | None = None,
    backend: str = "msgpack",
) -> Path:
    """Write a checkpoint directory; returns its path."""
    if backend not in ("msgpack", "orbax", "orbax-async"):
        raise ValueError(f"unknown checkpoint backend: {backend!r}")
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    host_vars = jax.device_get(variables)
    if backend.startswith("orbax"):
        async_save = backend == "orbax-async"
        _orbax_save(path / _ORBAX_VARS, host_vars, async_save, kind="vars")
        if opt_state is not None:
            _orbax_save(
                path / _ORBAX_OPT,
                jax.device_get(serialization.to_state_dict(opt_state)),
                async_save,
                kind="opt",
            )
    else:
        (path / "variables.msgpack").write_bytes(serialization.to_bytes(host_vars))
        if opt_state is not None:
            host_opt = jax.device_get(serialization.to_state_dict(opt_state))
            (path / "opt_state.msgpack").write_bytes(serialization.to_bytes(host_opt))
    meta = _to_py(dict(metadata or {}))
    (path / "metadata.json").write_text(json.dumps(meta, indent=2))
    return path


def load_checkpoint(
    path: str | os.PathLike,
    variables_template: Mapping[str, Any] | None = None,
    opt_state_template: Any = None,
) -> tuple[Any, Any, dict]:
    """Load (variables, opt_state, metadata) from a checkpoint directory.

    Auto-detects the storage backend.  With templates, restores exact pytree
    structure/dtypes; without, returns raw nested dicts of numpy arrays.
    """
    path = Path(path)
    wait_for_async_saves()  # a just-written async checkpoint must be complete
    if (path / _ORBAX_VARS).exists():
        restored = _orbax_checkpointer().restore((path / _ORBAX_VARS).resolve())
        if variables_template is not None:
            variables = serialization.from_state_dict(variables_template, restored)
        else:
            variables = restored
        opt_state = None
        if (path / _ORBAX_OPT).exists():
            raw_opt = _orbax_checkpointer().restore((path / _ORBAX_OPT).resolve())
            if opt_state_template is not None:
                opt_state = serialization.from_state_dict(opt_state_template, raw_opt)
            else:
                opt_state = raw_opt
    else:
        raw = (path / "variables.msgpack").read_bytes()
        if variables_template is not None:
            variables = serialization.from_bytes(variables_template, raw)
        else:
            variables = serialization.msgpack_restore(raw)

        opt_state = None
        opt_file = path / "opt_state.msgpack"
        if opt_file.exists():
            raw_opt = opt_file.read_bytes()
            if opt_state_template is not None:
                opt_state = serialization.from_state_dict(
                    opt_state_template, serialization.msgpack_restore(raw_opt)
                )
            else:
                opt_state = serialization.msgpack_restore(raw_opt)

    meta_file = path / "metadata.json"
    metadata = json.loads(meta_file.read_text()) if meta_file.exists() else {}
    return variables, opt_state, metadata


def sniff_stage(path: str | os.PathLike, default: int = 4) -> int:
    """Stage detection: metadata['stage'] if present, else ``default``
    (the reference assumes raw state-dicts are stage 4,
    ref: test_monuseg.py:139-147)."""
    meta_file = Path(path) / "metadata.json"
    if meta_file.exists():
        meta = json.loads(meta_file.read_text())
        if "stage" in meta:
            return int(meta["stage"])
    return default


def latest_checkpoint(directory: str | os.PathLike, prefix: str = "") -> Path | None:
    """Most recently modified checkpoint dir under ``directory``."""
    directory = Path(directory)
    if not directory.exists():
        return None
    candidates = [
        p for p in directory.iterdir()
        if p.is_dir() and has_checkpoint(p) and p.name.startswith(prefix)
    ]
    return max(candidates, key=lambda p: p.stat().st_mtime) if candidates else None

"""Stage-to-stage weight transfer as a pytree operation.

Reproduces the reference's name-based state-dict merge
(ref: UG_unet.py:345-411): for every leaf path present in both stages,

* exact shape match       -> full copy
* conv kernels (4-D)      -> copy the overlapping channel slab; flax kernels
  are (kh, kw, in, out) so the slab is ``[..., :in, :out]`` (the torch
  equivalent of ``[:out, :in, :, :]`` on (out, in, kh, kw))
* dense kernels (2-D)     -> ``[:in, :out]`` overlap
* 1-D (bias / BN stats)   -> leading ``[:n]`` overlap

Because every PGUNet stage names its blocks identically (``inc``, ``down4``,
``up1``, ...), deep layers genuinely carry over while new shallow layers keep
their fresh initialization.  Works on full flax variable trees, i.e. both
``params`` and ``batch_stats`` (BN running stats transfer too, matching the
reference's 1-D slab copy of running_mean/var, ref: UG_unet.py:397-404).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

__all__ = ["transfer_weights", "flatten_tree", "unflatten_tree"]


def flatten_tree(tree: Mapping[str, Any], prefix: tuple[str, ...] = ()) -> dict[tuple[str, ...], Any]:
    out: dict[tuple[str, ...], Any] = {}
    for k, v in tree.items():
        path = prefix + (k,)
        if isinstance(v, Mapping):
            out.update(flatten_tree(v, path))
        else:
            out[path] = v
    return out


def unflatten_tree(flat: Mapping[tuple[str, ...], Any]) -> dict:
    root: dict = {}
    for path, v in flat.items():
        node = root
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return root


def _overlap_copy(prev: jax.Array, cur: jax.Array) -> jax.Array | None:
    """Copy the overlapping slab of ``prev`` into ``cur``; None if unhandled."""
    if prev.shape == cur.shape:
        # Fresh buffer (the reference clone()s too, ref: UG_unet.py:371) —
        # critical under jit donation: without the copy, the merged tree
        # aliases the frozen prev-stage tree, and donating one would
        # invalidate the other inside a single fused train step.
        return jnp.copy(prev)
    if prev.ndim != cur.ndim:
        return None
    if prev.ndim == 4:  # conv kernel (kh, kw, in, out)
        if prev.shape[:2] != cur.shape[:2]:
            return None
        ci = min(prev.shape[2], cur.shape[2])
        co = min(prev.shape[3], cur.shape[3])
        return cur.at[:, :, :ci, :co].set(prev[:, :, :ci, :co])
    if prev.ndim == 2:  # dense kernel (in, out)
        ci = min(prev.shape[0], cur.shape[0])
        co = min(prev.shape[1], cur.shape[1])
        return cur.at[:ci, :co].set(prev[:ci, :co])
    if prev.ndim == 1:  # bias / BN scale / running stats
        n = min(prev.shape[0], cur.shape[0])
        return cur.at[:n].set(prev[:n])
    return None


def _shapes_mergeable(pv, cv) -> bool:
    """Static predicate mirroring ``_overlap_copy``'s handled cases."""
    if pv.shape == cv.shape:
        return True
    if pv.ndim != cv.ndim:
        return False
    if pv.ndim == 4:
        return pv.shape[:2] == cv.shape[:2]
    return pv.ndim in (1, 2)


@jax.jit
def _merge_leaves(prev_leaves, cur_leaves):
    """All slab copies fused into one XLA program (cached by shapes)."""
    return [_overlap_copy(p, c) for p, c in zip(prev_leaves, cur_leaves)]


def transfer_weights(
    prev_variables: Mapping[str, Any],
    cur_variables: Mapping[str, Any],
    verbose: bool = False,
) -> tuple[dict, list[str]]:
    """Merge prev-stage variables into cur-stage variables by name.

    Returns (new_variables, copied_key_names).  Keys only in one tree are
    left untouched; shape-incompatible leaves fall back to the current
    (freshly initialized) value — matching the reference's behavior.

    The whole merge executes as ONE jitted program (keyed by the two trees'
    shapes): per-leaf eager slab copies would dispatch hundreds of small
    device ops — painful on remote backends, free to fuse in XLA.
    """
    prev_flat = flatten_tree(prev_variables)
    cur_flat = dict(flatten_tree(cur_variables))
    plan: list[tuple[tuple[str, ...], Any, Any]] = []
    copied: list[str] = []
    for path, pv in prev_flat.items():
        cv = cur_flat.get(path)
        if cv is None:
            continue
        if not hasattr(pv, "shape") or not hasattr(cv, "shape"):
            continue
        plan.append((path, pv, cv))

    if plan:
        # _overlap_copy returns None for unhandled rank pairs — resolve the
        # plan on shapes first (trace-time constants), then run one program
        mergeable = [
            (path, pv, cv) for path, pv, cv in plan if _shapes_mergeable(pv, cv)
        ]
        if mergeable:
            merged = _merge_leaves(
                [jnp.asarray(pv) for _, pv, _ in mergeable],
                [jnp.asarray(cv) for _, _, cv in mergeable],
            )
            for (path, _, _), m in zip(mergeable, merged):
                cur_flat[path] = m
                copied.append("/".join(path))
    if verbose:
        print(
            f"transfer_weights: copied {len(copied)} keys "
            f"(examples: {copied[:5]})"
        )
    return unflatten_tree(cur_flat), copied

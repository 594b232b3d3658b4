"""Import reference PyTorch checkpoints into ugpg_tpu variable trees.

A reference user's trained ``.pth`` files load directly: this maps the
torch state-dict naming/layout to our flax trees.

Name mapping (reference module structure -> our flax scopes):

    inc.conv.conv_op.{0,1,3,4}.*       -> inc/conv/{conv1,bn1,conv2,bn2}
      (InConv holds a DoubleConv whose Sequential packs
       [Conv, BN, ReLU, Conv, BN, ReLU]; ref: UG_unet_parts.py:5-28)
    downX.mpconv.1.conv_op.N.*         -> downX/conv/...   (ref: :44-54)
    upX.conv.conv_op.N.*               -> upX/conv/...     (ref: :70-81)
    outcX.conv.*                       -> outcX/conv       (ref: :84-91)
    unet.<any of the above>            -> unet/...         (classifier encoder)
    classifier.{3,6,9}.*               -> fc1/fc2/fc3      (the Linear slots of
       the reference's head Sequential; ref: Herlev/train_herlev.py:66-77)

Layout conversion:
    conv weight   OIHW -> HWIO (transpose 2,3,1,0)
    linear weight (out,in) -> (in,out)
    BN weight/bias -> scale/bias; running_mean/var -> batch_stats mean/var

Checkpoint containers: accepts a raw state dict or the reference's
``{'model_state_dict': ...}`` wrapper (ref: test_monuseg.py:124-138).
Legacy ``UNet``'s ConvTranspose kernels are not mapped (unused by any
reference entry point); such keys are reported as skipped.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from ugpg_tpu.progressive.transfer import flatten_tree, unflatten_tree

__all__ = ["convert_torch_state_dict", "import_torch_checkpoint"]

_SEQ_SLOT = {"0": ("conv1", "conv"), "1": ("bn1", "bn"),
             "3": ("conv2", "conv"), "4": ("bn2", "bn")}
_HEAD_SLOT = {"3": "fc1", "6": "fc2", "9": "fc3"}


def _convert_leaf(kind: str, pname: str, value: np.ndarray):
    """-> (collection, leaf_name, array) or None if not a parameter."""
    v = np.asarray(value)
    if kind == "conv":
        if pname == "weight":
            return "params", "kernel", v.transpose(2, 3, 1, 0)
        if pname == "bias":
            return "params", "bias", v
    elif kind == "bn":
        if pname == "weight":
            return "params", "scale", v
        if pname == "bias":
            return "params", "bias", v
        if pname == "running_mean":
            return "batch_stats", "mean", v
        if pname == "running_var":
            return "batch_stats", "var", v
        return None  # num_batches_tracked
    elif kind == "linear":
        if pname == "weight":
            return "params", "kernel", v.T
        if pname == "bias":
            return "params", "bias", v
    return None


def _map_key(key: str, value) -> tuple[str, tuple[str, ...], np.ndarray] | None:
    parts = key.split(".")
    prefix: tuple[str, ...] = ()
    if parts[0] == "unet":
        prefix = ("unet",)
        parts = parts[1:]

    # classifier head: classifier.{3,6,9}.{weight,bias}
    if parts[0] == "classifier" and len(parts) == 3:
        slot = _HEAD_SLOT.get(parts[1])
        if slot is None:
            return None
        out = _convert_leaf("linear", parts[2], value)
        if out is None:
            return None
        coll, leaf, arr = out
        return coll, prefix + (slot, leaf), arr

    block = parts[0]
    rest = parts[1:]
    # Down: mpconv.1.conv_op.N.p ; InConv/Up: conv.conv_op.N.p
    if len(rest) >= 3 and rest[0] == "mpconv" and rest[1] == "1":
        rest = ["conv"] + rest[2:]
    if len(rest) == 4 and rest[0] == "conv" and rest[1] == "conv_op":
        slot = _SEQ_SLOT.get(rest[2])
        if slot is None:
            return None
        sub, kind = slot
        out = _convert_leaf(kind, rest[3], value)
        if out is None:
            return None
        coll, leaf, arr = out
        return coll, prefix + (block, "conv", sub, leaf), arr
    # bare DoubleConv (legacy bottle_neck): conv_op.N.p
    if len(rest) == 3 and rest[0] == "conv_op":
        slot = _SEQ_SLOT.get(rest[1])
        if slot is None:
            return None
        sub, kind = slot
        out = _convert_leaf(kind, rest[2], value)
        if out is None:
            return None
        coll, leaf, arr = out
        return coll, prefix + (block, sub, leaf), arr
    # OutConv: conv.{weight,bias}
    if len(rest) == 2 and rest[0] == "conv":
        out = _convert_leaf("conv", rest[1], value)
        if out is None:
            return None
        coll, leaf, arr = out
        return coll, prefix + (block, "conv", leaf), arr
    return None


def convert_torch_state_dict(
    state_dict: Mapping[str, Any],
    template_variables: Mapping[str, Any] | None = None,
    strict: bool = False,
) -> tuple[dict, list[str]]:
    """Convert a torch state dict; returns (variables, skipped_keys).

    With a template, converted leaves replace matching template leaves
    (shape-checked) and everything else keeps its template value — so a
    partial checkpoint (e.g. encoder-only) still yields a usable tree.
    """
    if "model_state_dict" in state_dict:
        state_dict = state_dict["model_state_dict"]

    converted: dict[tuple[str, ...], np.ndarray] = {}
    skipped: list[str] = []
    for key, value in state_dict.items():
        if hasattr(value, "detach"):
            value = value.detach().cpu().numpy()
        mapped = _map_key(key, value)
        if mapped is None:
            if not key.endswith("num_batches_tracked"):
                skipped.append(key)
            continue
        coll, path, arr = mapped
        converted[(coll,) + path] = arr

    if template_variables is None:
        tree = unflatten_tree(converted)
        if strict and skipped:
            raise ValueError(f"unmapped torch keys: {skipped[:10]}")
        return tree, skipped

    flat = dict(flatten_tree(template_variables))
    for path, arr in converted.items():
        if path in flat:
            if tuple(flat[path].shape) != tuple(arr.shape):
                raise ValueError(
                    f"shape mismatch at {'/'.join(path)}: "
                    f"torch {arr.shape} vs template {tuple(flat[path].shape)}"
                )
            flat[path] = arr.astype(np.asarray(flat[path]).dtype)
        else:
            skipped.append("/".join(path))
    if strict and skipped:
        raise ValueError(f"unmapped keys: {skipped[:10]}")
    return unflatten_tree(flat), skipped


def import_torch_checkpoint(
    pth_path: str,
    stage: int | None = None,
    num_classes: int = 1,
    task_type: str = "segmentation",
    output_dir: str | None = None,
):
    """Load a reference ``.pth``, convert, and optionally save as one of our
    checkpoints.  Sniffs the stage from the checkpoint dict like the
    reference loader (raw state dict -> assume stage 4)."""
    import torch

    import jax
    import jax.numpy as jnp

    raw = torch.load(pth_path, map_location="cpu", weights_only=False)
    meta: dict = {}
    if isinstance(raw, dict) and "model_state_dict" in raw:
        meta = {k: v for k, v in raw.items() if k != "model_state_dict"
                and isinstance(v, (int, float, str, bool))}
        if stage is None and "stage" in raw:
            stage = int(raw["stage"])
        sd = raw["model_state_dict"]
    else:
        sd = raw
    stage = stage or 4

    if task_type == "segmentation":
        from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS

        module = STAGE_MODELS[stage](num_classes=num_classes)
        res = STAGE_RESOLUTIONS[stage]
    else:
        from ugpg_tpu.models.classifier import (
            CLS_STAGE_RESOLUTIONS,
            HerlevClassificationModel,
        )

        module = HerlevClassificationModel(stage=stage, num_classes=num_classes)
        res = CLS_STAGE_RESOLUTIONS[stage]
    template = module.init(
        jax.random.key(0), jnp.zeros((1, res, res, 3)), False
    )
    variables, skipped = convert_torch_state_dict(sd, template)
    if skipped:
        print(f"import: {len(skipped)} unmapped keys (examples: {skipped[:5]})")

    if output_dir:
        from ugpg_tpu.io.checkpoint import save_checkpoint

        save_checkpoint(
            output_dir, variables, metadata={"stage": stage, **meta,
                                             "imported_from": str(pth_path)}
        )
        print(f"imported {pth_path} -> {output_dir} (stage {stage})")
    return variables, stage

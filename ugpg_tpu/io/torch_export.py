"""Export ugpg_tpu variable trees as reference-loadable PyTorch checkpoints.

The inverse of :mod:`ugpg_tpu.io.torch_import`: a model trained here saves
as a ``.pth`` the reference's own eval CLIs load with their default
``strict=True`` ``load_state_dict`` — so a user can train on TPU and keep
deploying/evaluating in the original PyTorch stack during a migration.

Name mapping (our flax scopes -> reference module names; the exact inverse
of torch_import's table):

    inc/conv/{conv1,bn1,conv2,bn2}     -> inc.conv.conv_op.{0,1,3,4}.*
      (InConv holds a DoubleConv whose Sequential packs
       [Conv, BN, ReLU, Conv, BN, ReLU]; ref: UG_unet_parts.py:5-28)
    downX/conv/...                     -> downX.mpconv.1.conv_op.N.*  (ref: :44-54)
    upX/conv/...                       -> upX.conv.conv_op.N.*        (ref: :70-81)
    outcX/conv                         -> outcX.conv.*                (ref: :84-91)
    unet/...                           -> unet.<...>   (classifier encoder)
    fc1/fc2/fc3                        -> classifier.{3,6,9}.*  (the Linear
       slots of the reference head Sequential; ref: Herlev/train_herlev.py:66-77)

Layout conversion (inverse of import):
    conv kernel   HWIO -> OIHW (transpose 3,2,0,1)
    linear kernel (in,out) -> (out,in)
    BN scale/bias -> weight/bias; batch_stats mean/var -> running_mean/var;
    a zero int64 ``num_batches_tracked`` is synthesized per BN module
    (torch BatchNorm2d registers it as a buffer, so strict loading requires
    the key; the reference never reads it).

Classifier completeness: the reference ``HerlevClassificationModel`` holds a
FULL ``PGUNet{stage}(num_classes=1)`` even though its forward walks only the
encoder (ref: train_herlev.py:47,83-102), so its state dict contains decoder
keys our encoder-only classifier never materializes.  Export synthesizes the
missing decoder slots from a seeded fresh init of the matching segmentation
stage — they are dead weights to the reference forward, and the trained
encoder + head keys always take precedence.
"""

from __future__ import annotations

import re
from typing import Any, Mapping

import numpy as np

from ugpg_tpu.progressive.transfer import flatten_tree

__all__ = [
    "convert_variables_to_state_dict",
    "full_classifier_state_dict",
    "export_torch_checkpoint",
]

# flax DoubleConv child -> (reference Sequential slot, leaf kind)
_SLOT_OF = {"conv1": ("0", "conv"), "bn1": ("1", "bn"),
            "conv2": ("3", "conv"), "bn2": ("4", "bn")}
# classifier head Dense scopes -> reference Sequential Linear slots
_HEAD_OF = {"fc1": "classifier.3", "fc2": "classifier.6", "fc3": "classifier.9"}
_DOWN_RE = re.compile(r"down\d+$")


def _emit_leaf(kind: str, coll: str, leaf: str, arr: np.ndarray):
    """-> (torch param name, converted array) or None if unmapped."""
    if kind == "conv" and coll == "params":
        if leaf == "kernel":
            return "weight", arr.transpose(3, 2, 0, 1)
        if leaf == "bias":
            return "bias", arr
    elif kind == "bn":
        if coll == "params":
            if leaf == "scale":
                return "weight", arr
            if leaf == "bias":
                return "bias", arr
        elif coll == "batch_stats":
            if leaf == "mean":
                return "running_mean", arr
            if leaf == "var":
                return "running_var", arr
    elif kind == "linear" and coll == "params":
        if leaf == "kernel":
            return "weight", arr.T
        if leaf == "bias":
            return "bias", arr
    return None


def convert_variables_to_state_dict(
    variables: Mapping[str, Any],
) -> tuple[dict[str, np.ndarray], list[str]]:
    """Convert a flax variable tree to a torch-named state dict.

    Returns ``(state_dict, skipped_paths)`` with float32 numpy values
    (plus int64 zeros for the synthesized ``num_batches_tracked`` buffers).
    Unmapped leaves (e.g. the legacy UNet's ConvTranspose kernels, which
    torch_import also skips) land in ``skipped_paths``.
    """
    sd: dict[str, np.ndarray] = {}
    skipped: list[str] = []
    bn_bases: set[str] = set()

    for path, value in flatten_tree(variables).items():
        coll, *scope = path
        arr = np.asarray(value, dtype=np.float32)
        tprefix = ""
        if scope and scope[0] == "unet":
            tprefix = "unet."
            scope = scope[1:]

        base = pname = None
        if len(scope) == 2 and scope[0] in _HEAD_OF:
            out = _emit_leaf("linear", coll, scope[1], arr)
            if out is not None:
                pname, arr = out
                base = _HEAD_OF[scope[0]]
        elif len(scope) == 4 and scope[1] == "conv" and scope[2] in _SLOT_OF:
            block = scope[0]
            slot, kind = _SLOT_OF[scope[2]]
            out = _emit_leaf(kind, coll, scope[3], arr)
            if out is not None:
                pname, arr = out
                mid = "mpconv.1" if _DOWN_RE.match(block) else "conv"
                base = f"{block}.{mid}.conv_op.{slot}"
                if kind == "bn":
                    bn_bases.add(tprefix + base)
        elif len(scope) == 3 and scope[1] in _SLOT_OF:
            # bare DoubleConv (legacy bottle_neck): block/convN/leaf
            slot, kind = _SLOT_OF[scope[1]]
            out = _emit_leaf(kind, coll, scope[2], arr)
            if out is not None:
                pname, arr = out
                base = f"{scope[0]}.conv_op.{slot}"
                if kind == "bn":
                    bn_bases.add(tprefix + base)
        elif len(scope) == 3 and scope[1] == "conv":
            # OutConv head: block/conv/{kernel,bias}
            out = _emit_leaf("conv", coll, scope[2], arr)
            if out is not None:
                pname, arr = out
                base = f"{scope[0]}.conv"

        if base is None:
            skipped.append("/".join(path))
            continue
        sd[f"{tprefix}{base}.{pname}"] = np.ascontiguousarray(arr)

    for bn in bn_bases:
        sd[f"{bn}.num_batches_tracked"] = np.asarray(0, dtype=np.int64)
    return sd, skipped


def full_classifier_state_dict(
    variables: Mapping[str, Any], stage: int, seed: int = 0
) -> tuple[dict[str, np.ndarray], list[str]]:
    """Classifier state dict padded to the reference's full-unet key set.

    Decoder slots the encoder-only classifier lacks are filled from a
    seeded fresh PGUNet init (unused by the reference forward); trained
    encoder/head keys always win.
    """
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS

    sd, skipped = convert_variables_to_state_dict(variables)
    res = STAGE_RESOLUTIONS[stage]
    template = STAGE_MODELS[stage](num_classes=1).init(
        jax.random.key(seed), jnp.zeros((1, res, res, 3)), False
    )
    tsd, _ = convert_variables_to_state_dict(template)
    for key, value in tsd.items():
        sd.setdefault(f"unet.{key}", value)
    return sd, skipped


def export_torch_checkpoint(
    checkpoint_path: str,
    out_path: str,
    task_type: str = "segmentation",
    stage: int | None = None,
    raw_state_dict: bool = False,
    strict: bool = False,
):
    """Load one of our checkpoints and save a reference-format ``.pth``.

    Segmentation containers mirror the reference best-checkpoint dict
    (ref: uncertainty_guided_trainer.py:384-393) minus optimizer state;
    classification mirrors train_herlev.py:466-479 including the embedded
    ``config`` its eval CLI reads ``num_classes`` from (test_herlev.py:78-96).
    ``raw_state_dict=True`` saves the bare tensor dict (the reference seg
    loader then assumes stage 4; ref: test_monuseg.py:131-138).
    """
    import torch

    from ugpg_tpu.io.checkpoint import load_checkpoint

    variables, _, meta = load_checkpoint(checkpoint_path)
    meta = meta or {}
    if stage is None:
        stage = int(meta.get("stage", 4))

    if task_type == "segmentation":
        sd, skipped = convert_variables_to_state_dict(variables)
    elif task_type == "classification":
        sd, skipped = full_classifier_state_dict(variables, stage)
    else:
        raise ValueError(f"unknown task_type: {task_type!r}")
    if skipped:
        msg = f"export: {len(skipped)} unmapped leaves (examples: {skipped[:5]})"
        if strict:
            raise ValueError(msg)
        print(msg)

    tsd = {k: torch.from_numpy(np.array(v)) for k, v in sd.items()}
    if raw_state_dict:
        torch.save(tsd, out_path)
        print(f"exported {checkpoint_path} -> {out_path} (raw state dict)")
        return out_path

    def _f(key, default=0.0):
        try:
            return float(meta.get(key, default))
        except (TypeError, ValueError):
            return default

    if task_type == "segmentation":
        container = {
            "stage": stage,
            "epoch": int(_f("epoch", 0)),
            "model_state_dict": tsd,
            "val_dice": _f("val_dice"),
            "train_dice": _f("train_dice"),
            "uncertainty_alpha": _f("uncertainty_alpha", 1.0),
        }
    else:
        num_classes = int(np.asarray(
            variables["params"]["fc3"]["kernel"]).shape[-1])
        container = {
            "stage": stage,
            "epoch": int(_f("epoch", 0)),
            "model_state_dict": tsd,
            "train_loss": _f("train_loss"),
            "val_loss": _f("val_loss"),
            "train_acc": _f("train_acc"),
            "val_acc": _f("val_acc"),
            "config": {"num_classes": num_classes, "stage": stage,
                       "exported_from": str(checkpoint_path)},
        }
    torch.save(container, out_path)
    print(f"exported {checkpoint_path} -> {out_path} "
          f"(stage {stage}, {task_type})")
    return out_path

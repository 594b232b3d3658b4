"""ugpg_tpu: TPU-native Uncertainty-Guided Progressive-Growing U-Net framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tridang04022004/UG-PG-UNet (reference layout documented in SURVEY.md):
progressive multi-resolution U-Nets with uncertainty-guided loss weighting
for medical-image segmentation (MoNuSeg) and classification (Herlev).

The flat names below mirror the reference's public surface.  They resolve
lazily (PEP 562) so lightweight deployment imports — e.g.
``ugpg_tpu.eval.exported``, which needs only jax + numpy — do not pull the
full flax/training stack.
"""

from __future__ import annotations

import importlib

__version__ = "0.1.0"

# public name -> defining submodule, resolved on first attribute access
_EXPORTS = {
    "PGUNet1": "ugpg_tpu.models.pgunet",
    "PGUNet2": "ugpg_tpu.models.pgunet",
    "PGUNet3": "ugpg_tpu.models.pgunet",
    "PGUNet4": "ugpg_tpu.models.pgunet",
    "UNet": "ugpg_tpu.models.pgunet",
    "ProgressiveUNet": "ugpg_tpu.models.progressive",
    "HerlevClassificationModel": "ugpg_tpu.models.classifier",
    "UncertaintyGuidedLoss": "ugpg_tpu.uncertainty",
    "apply_uncertainty_weighted_loss": "ugpg_tpu.uncertainty",
    "binary_uncertainty": "ugpg_tpu.uncertainty",
    "create_uncertainty_weighted_loss_fn": "ugpg_tpu.uncertainty",
    "entropy_uncertainty": "ugpg_tpu.uncertainty",
    "generate_uncertainty_map": "ugpg_tpu.uncertainty",
    "mc_dropout_uncertainty": "ugpg_tpu.uncertainty",
    "HerlevDataset": "ugpg_tpu.data.herlev",
    "create_herlev_splits": "ugpg_tpu.data.herlev",
    "AugMoNuSegDataset": "ugpg_tpu.data.monuseg",
    "MoNuSegDataset": "ugpg_tpu.data.monuseg",
    "create_train_val_split": "ugpg_tpu.data.monuseg",
    "xml_to_mask": "ugpg_tpu.data.rasterize",
    "AugMoNuSegTrainer": "ugpg_tpu.train.aug_trainer",
    "HerlevTrainer": "ugpg_tpu.train.cls_trainer",
    "UncertaintyGuidedProgressiveTrainer": "ugpg_tpu.train.seg_trainer",
}

__all__ = sorted(_EXPORTS)


def __getattr__(name: str):
    module = _EXPORTS.get(name)
    if module is None:
        raise AttributeError(f"module 'ugpg_tpu' has no attribute {name!r}")
    value = getattr(importlib.import_module(module), name)
    globals()[name] = value  # cache: subsequent lookups skip __getattr__
    return value


def __dir__():
    return sorted(set(globals()) | set(__all__))

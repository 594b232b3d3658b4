"""ugpg_tpu: TPU-native Uncertainty-Guided Progressive-Growing U-Net framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
tridang04022004/UG-PG-UNet (reference layout documented in SURVEY.md):
progressive multi-resolution U-Nets with uncertainty-guided loss weighting
for medical-image segmentation (MoNuSeg) and classification (Herlev).
"""

from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2, PGUNet3, PGUNet4, UNet
from ugpg_tpu.models.progressive import ProgressiveUNet
from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.uncertainty import (
    UncertaintyGuidedLoss,
    apply_uncertainty_weighted_loss,
    binary_uncertainty,
    create_uncertainty_weighted_loss_fn,
    entropy_uncertainty,
    generate_uncertainty_map,
    mc_dropout_uncertainty,
)

# data / training / evaluation layers (imported lazily by most users via
# submodules; the flat names here mirror the reference's public surface)
from ugpg_tpu.data.herlev import HerlevDataset, create_herlev_splits
from ugpg_tpu.data.monuseg import (
    AugMoNuSegDataset,
    MoNuSegDataset,
    create_train_val_split,
)
from ugpg_tpu.data.rasterize import xml_to_mask
from ugpg_tpu.train.aug_trainer import AugMoNuSegTrainer
from ugpg_tpu.train.cls_trainer import HerlevTrainer
from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

__version__ = "0.1.0"

__all__ = [
    "PGUNet1",
    "PGUNet2",
    "PGUNet3",
    "PGUNet4",
    "UNet",
    "ProgressiveUNet",
    "HerlevClassificationModel",
    "UncertaintyGuidedLoss",
    "binary_uncertainty",
    "create_uncertainty_weighted_loss_fn",
    "entropy_uncertainty",
    "generate_uncertainty_map",
    "mc_dropout_uncertainty",
    "apply_uncertainty_weighted_loss",
    "MoNuSegDataset",
    "AugMoNuSegDataset",
    "HerlevDataset",
    "create_train_val_split",
    "create_herlev_splits",
    "xml_to_mask",
    "UncertaintyGuidedProgressiveTrainer",
    "AugMoNuSegTrainer",
    "HerlevTrainer",
]

"""Herlev classification model: PGUNet encoder + MLP head.

Re-design of ``HerlevClassificationModel`` (ref: Herlev/train_herlev.py:29-121):
the stage's U-Net encoder is walked down to the 512-channel feature map
(``inc`` plus the ``down*`` blocks up to ``down3``; ref
``_extract_features``, train_herlev.py:83-102), then a classification head
``GAP -> Dropout(.5) -> Dense(512) -> ReLU -> Dropout(.3) -> Dense(256) ->
ReLU -> Dropout(.2) -> Dense(K)`` (ref: train_herlev.py:66-77).

Encoder submodules live under ``unet/`` with the same names as the
segmentation stages so pretrained PGUNet checkpoints can be merged in with
the name-keyed transfer op (``ugpg_tpu.progressive.transfer``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ugpg_tpu.models.blocks import (
    Down,
    InConv,
    torch_linear_bias_init_for,
    torch_linear_kernel_init,
)

__all__ = ["HerlevClassificationModel", "CLS_STAGE_RESOLUTIONS"]

# Classification uses 224 (not 256) at stage 4 (ref: train_herlev.py:134-139).
CLS_STAGE_RESOLUTIONS = {1: 32, 2: 64, 3: 128, 4: 224}

# inc width and the (name, width) down blocks walked per stage; all stages
# end at a 512-channel feature map.
_ENCODER_SPECS = {
    1: (512, ()),
    2: (256, (("down3", 512),)),
    3: (128, (("down2", 256), ("down3", 512))),
    4: (64, (("down1", 128), ("down2", 256), ("down3", 512))),
}


class _Encoder(nn.Module):
    stage: int
    axis_name: str | None = None
    dtype: Any = None
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        inc_width, downs = _ENCODER_SPECS[self.stage]
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = InConv(inc_width, self.axis_name, self.dtype, remat=self.remat, name="inc")(x, train)
        for name, width in downs:
            x = Down(width, self.axis_name, self.dtype, remat=self.remat, name=name)(x, train)
        return x


def _dense(features: int, in_features: int, name: str) -> nn.Dense:
    return nn.Dense(
        features,
        kernel_init=torch_linear_kernel_init,
        bias_init=torch_linear_bias_init_for(in_features),
        name=name,
    )


class HerlevClassificationModel(nn.Module):
    """Encoder feature extractor + MLP classification head.

    ``freeze_encoder`` is handled at the optimizer level (see
    ``ugpg_tpu.train.optim.freeze_subtrees``) since flax params are
    immutable.  ``dropout_rates`` mirrors the reference head's (.5, .3, .2)
    (ref: train_herlev.py:66-77); pass zeros for deterministic training
    (used by the reference-trajectory parity harness).
    """

    stage: int
    num_classes: int = 7
    axis_name: str | None = None
    dtype: Any = None
    dropout_rates: tuple[float, float, float] = (0.5, 0.3, 0.2)
    remat: bool = False  # jax.checkpoint each encoder DoubleConv

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False,
                 mc_dropout: bool = False) -> jax.Array:
        """``mc_dropout=True`` activates the head's dropout layers while the
        encoder's BatchNorm stays in eval mode (running stats) — the
        standard Monte-Carlo-dropout inference setup consumed by
        ``uncertainty.mc_dropout_uncertainty`` and
        ``eval.serving.Predictor(mc_dropout=N)``."""
        feats = _Encoder(self.stage, self.axis_name, self.dtype, self.remat, name="unet")(x, train)
        # AdaptiveAvgPool2d(1) + Flatten -> global mean over H, W; head in f32.
        h = jnp.mean(feats.astype(jnp.float32), axis=(1, 2))
        deterministic = not (train or mc_dropout)
        d1, d2, d3 = self.dropout_rates
        h = nn.Dropout(d1, deterministic=deterministic, name="drop1")(h)
        h = nn.relu(_dense(512, h.shape[-1], "fc1")(h))
        h = nn.Dropout(d2, deterministic=deterministic, name="drop2")(h)
        h = nn.relu(_dense(256, 512, "fc2")(h))
        h = nn.Dropout(d3, deterministic=deterministic, name="drop3")(h)
        return _dense(self.num_classes, 256, "fc3")(h)

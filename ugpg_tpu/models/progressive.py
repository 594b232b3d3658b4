"""ProgressiveUNet: the user-facing facade over the four PG stages.

Exposes the README-documented API of the reference —
``ProgressiveUNet(in_channels=3, out_channels=2, stage=1)`` and
``task_type='segmentation' | 'classification'`` (ref: README.md:46-52) —
while implementing the actual code behavior (``set_stage`` mutator, input
resized to the stage resolution before dispatch; ref: UG_unet.py:307-426).

flax models are pure, so this facade owns no parameters: it hands out
``init``/``apply`` for the selected stage and utility ops (weight transfer,
resolution lookup).  Parameters live in caller-held variable trees, which is
what makes pjit sharding and donation straightforward.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp

from ugpg_tpu.models.classifier import CLS_STAGE_RESOLUTIONS, HerlevClassificationModel
from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS
from ugpg_tpu.ops.resize import resize_bilinear_align_corners
from ugpg_tpu.progressive.transfer import transfer_weights as _transfer

__all__ = ["ProgressiveUNet"]


class ProgressiveUNet:
    """Facade holding the four stage module definitions.

    Example:
        model = ProgressiveUNet(in_channels=3, out_channels=1, stage=1)
        variables = model.init(jax.random.key(0))
        logits = model.apply(variables, images)          # NHWC in, NHWK out
    """

    def __init__(
        self,
        in_channels: int = 3,
        out_channels: int | None = None,
        num_classes: int | None = None,
        stage: int = 1,
        task_type: str = "segmentation",
        axis_name: str | None = None,
        dtype=None,
        remat: bool = False,
    ):
        if task_type not in ("segmentation", "classification"):
            raise ValueError(f"unknown task_type: {task_type!r}")
        if out_channels is None and num_classes is None:
            out_channels = 1
        k = out_channels if out_channels is not None else num_classes
        self.in_channels = in_channels
        self.num_classes = int(k)
        self.task_type = task_type
        self.axis_name = axis_name
        self.dtype = dtype
        self.remat = remat
        self.stage_resolutions = (
            dict(STAGE_RESOLUTIONS)
            if task_type == "segmentation"
            else dict(CLS_STAGE_RESOLUTIONS)
        )
        if task_type == "segmentation":
            self.stages = {
                s: cls(num_classes=self.num_classes, axis_name=axis_name, dtype=dtype,
                       remat=remat)
                for s, cls in STAGE_MODELS.items()
            }
        else:
            self.stages = {
                s: HerlevClassificationModel(
                    stage=s, num_classes=self.num_classes, axis_name=axis_name,
                    dtype=dtype, remat=remat,
                )
                for s in STAGE_MODELS
            }
        self.current_stage = 1
        self.set_stage(stage)

    # -- reference API ----------------------------------------------------
    def set_stage(self, stage: int) -> None:
        """Set the current progressive stage (1-4) (ref: UG_unet.py:335-339)."""
        if stage not in (1, 2, 3, 4):
            raise ValueError("Stage must be 1, 2, 3, or 4")
        self.current_stage = stage

    def get_current_resolution(self) -> int:
        return self.stage_resolutions[self.current_stage]

    def module(self, stage: int | None = None):
        return self.stages[stage or self.current_stage]

    def init(
        self,
        rng: jax.Array,
        stage: int | None = None,
        batch_size: int = 1,
        dtype=jnp.float32,
    ) -> Mapping[str, Any]:
        stage = stage or self.current_stage
        res = self.stage_resolutions[stage]
        x = jnp.zeros((batch_size, res, res, self.in_channels), dtype)
        return self.stages[stage].init(rng, x, False)

    def apply(
        self,
        variables: Mapping[str, Any],
        x: jax.Array,
        train: bool = False,
        stage: int | None = None,
        target_resolution: int | None = None,
        rngs: Mapping[str, jax.Array] | None = None,
        mutable: Any = False,
    ):
        """Forward pass; input is resized to the stage resolution first
        (bilinear, align_corners=True), matching ref UG_unet.py:413-426."""
        stage = stage or self.current_stage
        res = target_resolution or self.stage_resolutions[stage]
        x = resize_bilinear_align_corners(x, (res, res))
        return self.stages[stage].apply(
            variables, x, train, rngs=rngs, mutable=mutable
        )

    def transfer_weights(
        self,
        prev_stage_variables: Mapping[str, Any],
        current_stage_variables: Mapping[str, Any],
        stage: int | None = None,
        verbose: bool = True,
    ):
        """Name-keyed overlap merge of prev-stage weights (ref: UG_unet.py:345-411)."""
        new_vars, copied = _transfer(
            prev_stage_variables, current_stage_variables, verbose=False
        )
        if verbose:
            print(
                f"transfer_weights(stage={stage or self.current_stage}): "
                f"copied {len(copied)} keys (examples: {copied[:5]})"
            )
        return new_vars

"""Progressive-Growing U-Net stages as pure flax modules (NHWC).

Re-implements the four PG stages (ref: UG_unet.py:178-304) and the legacy
``UNet`` (ref: UG_unet.py:430-462) as functional models.  Channel widths are
*inverted* vs a classic U-Net (stage 1 widest at lowest resolution) — the
PGU-Net+ design.  Every stage keeps a fixed 16x16 bottleneck and emits the
*sum* of multi-scale logits: each decoder level has its own 1x1 head whose
output is bilinearly upsampled (align_corners=True) to the stage resolution
and added (ref: UG_unet.py:221-223,257-259,300-303).

Submodule names (``inc``/``down1..4``/``up1..4``/``outc*``) are identical
across stages on purpose: stage-to-stage weight transfer is name-keyed, so
shared-depth layers carry over (ref: UG_unet.py:345-411).
"""

from __future__ import annotations

from typing import Any

import jax
from flax import linen as nn

from ugpg_tpu.models.blocks import DoubleConv, Down, DownSample, InConv, OutConv, Up, UpSample
from ugpg_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_bilinear_align_corners_nhw,
)

__all__ = ["PGUNet1", "PGUNet2", "PGUNet3", "PGUNet4", "UNet", "STAGE_MODELS", "STAGE_RESOLUTIONS"]

STAGE_RESOLUTIONS = {1: 32, 2: 64, 3: 128, 4: 256}


def _up_to(logits: jax.Array, hw: tuple[int, int]) -> jax.Array:
    """Upsample a logits map to the stage (H, W) — rectangular-safe, like
    the reference's scale-factor interpolate (ref: UG_unet.py:221,257,300).

    Accepts either (N,H,W,K) maps or channel-squeezed (N,H,W) maps (the
    single-class fast path — see blocks._Head1x1).
    """
    if logits.ndim == 3:
        return resize_bilinear_align_corners_nhw(logits, hw)
    return resize_bilinear_align_corners(logits, hw)


def _expand(logits: jax.Array) -> jax.Array:
    """(N,H,W) -> (N,H,W,1) at the model boundary (bitcast-cheap)."""
    return logits[..., None] if logits.ndim == 3 else logits



def _scaled(n: int, width: float) -> int:
    """Scale a reference channel count by the width multiplier (min 8).

    width != 1.0 is a framework extension (the reference's widths are
    fixed, ref: UG_unet.py:178-304): narrow variants keep the exact stage
    topology — name-keyed transfer, folding, quantization and the spatial
    walker all work unchanged — for fast compile-bounded validation
    (e.g. the driver dryrun's full-trainer phase) and small deployments.
    """
    return max(8, round(n * width))

class PGUNet1(nn.Module):
    """Stage 1, 32px: inc(C,512) -> down4 -> up1 -> outc (ref: UG_unet.py:178-193)."""

    num_classes: int = 1
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True  # False = run on BN-folded weights (models/folding.py)
    remat: bool = False  # jax.checkpoint each DoubleConv (activation remat)
    width: float = 1.0  # channel-width multiplier (1.0 = reference widths)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a, dt, ub, rm = self.axis_name, self.dtype, self.use_bn, self.remat
        c = lambda n: _scaled(n, self.width)
        x = x.astype(dt) if dt is not None else x
        x1 = InConv(c(512), a, dt, ub, rm, name="inc")(x, train)          # 32x32x512
        x2 = Down(c(512), a, dt, ub, rm, name="down4")(x1, train)         # 16x16x512
        x3 = Up(c(256), a, dt, ub, rm, name="up1")(x2, x1, train)         # 32x32x256
        sq = self.num_classes == 1
        return _expand(OutConv(self.num_classes, name="outc")(x3, squeezed=sq))


class PGUNet2(nn.Module):
    """Stage 2, 64px (ref: UG_unet.py:196-223)."""

    num_classes: int = 1
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True  # False = run on BN-folded weights (models/folding.py)
    remat: bool = False  # jax.checkpoint each DoubleConv (activation remat)
    width: float = 1.0  # channel-width multiplier (1.0 = reference widths)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a, dt, ub, rm = self.axis_name, self.dtype, self.use_bn, self.remat
        c = lambda n: _scaled(n, self.width)
        x = x.astype(dt) if dt is not None else x
        x1 = InConv(c(256), a, dt, ub, rm, name="inc")(x, train)          # 64
        x2 = Down(c(512), a, dt, ub, rm, name="down3")(x1, train)         # 32
        x3 = Down(c(512), a, dt, ub, rm, name="down4")(x2, train)         # 16
        x4 = Up(c(256), a, dt, ub, rm, name="up1")(x3, x2, train)         # 32
        x5 = Up(c(128), a, dt, ub, rm, name="up2")(x4, x1, train)         # 64
        sq = self.num_classes == 1
        o1 = OutConv(self.num_classes, name="outc1")(x4, squeezed=sq)
        o2 = OutConv(self.num_classes, name="outc2")(x5, squeezed=sq)
        return _expand(_up_to(o1, o2.shape[1:3]) + o2)


class PGUNet3(nn.Module):
    """Stage 3, 128px (ref: UG_unet.py:226-260)."""

    num_classes: int = 1
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True  # False = run on BN-folded weights (models/folding.py)
    remat: bool = False  # jax.checkpoint each DoubleConv (activation remat)
    width: float = 1.0  # channel-width multiplier (1.0 = reference widths)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a, dt, ub, rm = self.axis_name, self.dtype, self.use_bn, self.remat
        c = lambda n: _scaled(n, self.width)
        x = x.astype(dt) if dt is not None else x
        x1 = InConv(c(128), a, dt, ub, rm, name="inc")(x, train)          # 128
        x2 = Down(c(256), a, dt, ub, rm, name="down2")(x1, train)         # 64
        x3 = Down(c(512), a, dt, ub, rm, name="down3")(x2, train)         # 32
        x4 = Down(c(512), a, dt, ub, rm, name="down4")(x3, train)         # 16
        x5 = Up(c(256), a, dt, ub, rm, name="up1")(x4, x3, train)         # 32
        x6 = Up(c(128), a, dt, ub, rm, name="up2")(x5, x2, train)         # 64
        x7 = Up(c(64), a, dt, ub, rm, name="up3")(x6, x1, train)          # 128
        res = x7.shape[1:3]
        sq = self.num_classes == 1
        o = _up_to(OutConv(self.num_classes, name="outc1")(x5, squeezed=sq), res)
        o = o + _up_to(OutConv(self.num_classes, name="outc2")(x6, squeezed=sq), res)
        return _expand(o + OutConv(self.num_classes, name="outc3")(x7, squeezed=sq))


class PGUNet4(nn.Module):
    """Stage 4, 256px (ref: UG_unet.py:263-304)."""

    num_classes: int = 1
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True  # False = run on BN-folded weights (models/folding.py)
    remat: bool = False  # jax.checkpoint each DoubleConv (activation remat)
    width: float = 1.0  # channel-width multiplier (1.0 = reference widths)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a, dt, ub, rm = self.axis_name, self.dtype, self.use_bn, self.remat
        c = lambda n: _scaled(n, self.width)
        x = x.astype(dt) if dt is not None else x
        x1 = InConv(c(64), a, dt, ub, rm, name="inc")(x, train)           # 256
        x2 = Down(c(128), a, dt, ub, rm, name="down1")(x1, train)         # 128
        x3 = Down(c(256), a, dt, ub, rm, name="down2")(x2, train)         # 64
        x4 = Down(c(512), a, dt, ub, rm, name="down3")(x3, train)         # 32
        x5 = Down(c(512), a, dt, ub, rm, name="down4")(x4, train)         # 16
        x6 = Up(c(256), a, dt, ub, rm, name="up1")(x5, x4, train)         # 32
        x7 = Up(c(128), a, dt, ub, rm, name="up2")(x6, x3, train)         # 64
        x8 = Up(c(64), a, dt, ub, rm, name="up3")(x7, x2, train)          # 128
        x9 = Up(c(64), a, dt, ub, rm, name="up4")(x8, x1, train)          # 256
        res = x9.shape[1:3]
        sq = self.num_classes == 1
        o = _up_to(OutConv(self.num_classes, name="outc1")(x6, squeezed=sq), res)
        o = o + _up_to(OutConv(self.num_classes, name="outc2")(x7, squeezed=sq), res)
        o = o + _up_to(OutConv(self.num_classes, name="outc3")(x8, squeezed=sq), res)
        return _expand(o + OutConv(self.num_classes, name="outc4")(x9, squeezed=sq))


STAGE_MODELS = {1: PGUNet1, 2: PGUNet2, 3: PGUNet3, 4: PGUNet4}


class UNet(nn.Module):
    """Legacy classic U-Net, kept for API compatibility (ref: UG_unet.py:430-462)."""

    num_classes: int = 1
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        a = self.axis_name
        d1, p1 = DownSample(64, a, name="down_convolution_1")(x, train)
        d2, p2 = DownSample(128, a, name="down_convolution_2")(p1, train)
        d3, p3 = DownSample(256, a, name="down_convolution_3")(p2, train)
        d4, p4 = DownSample(512, a, name="down_convolution_4")(p3, train)
        b = DoubleConv(1024, a, name="bottle_neck")(p4, train)
        u1 = UpSample(512, a, name="up_convolution_1")(b, d4, train)
        u2 = UpSample(256, a, name="up_convolution_2")(u1, d3, train)
        u3 = UpSample(128, a, name="up_convolution_3")(u2, d2, train)
        u4 = UpSample(64, a, name="up_convolution_4")(u3, d1, train)
        return OutConv(self.num_classes, name="out")(u4)

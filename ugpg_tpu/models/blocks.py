"""U-Net building blocks as flax.linen modules (NHWC, TPU-native).

Functional re-design of the reference block set (ref: UG_unet_parts.py:5-91):
``DoubleConv``, ``InConv``, ``Down``, ``Up``, ``OutConv`` for the progressive
path and ``DownSample``/``UpSample`` for the legacy UNet.  Differences from
the reference are deliberate TPU choices:

* NHWC layout (XLA's native conv layout on TPU) instead of NCHW.
* BatchNorm carries explicit ``batch_stats`` collections (pure functions, no
  mutable module state) and optionally syncs across a data-parallel mesh axis
  via ``axis_name``.
* Initializers reproduce torch's Conv2d/Linear defaults
  (kaiming_uniform(a=sqrt(5)) == U(-1/sqrt(fan_in), 1/sqrt(fan_in))) so that
  training trajectories are statistically comparable to the reference.

Submodule names (``conv1``/``bn1``/...) are stable because stage-to-stage
weight transfer is name-keyed (ref: UG_unet.py:345-411).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ugpg_tpu.ops.resize import upsample2x_bilinear_align_corners

__all__ = [
    "DoubleConv",
    "InConv",
    "Down",
    "Up",
    "OutConv",
    "DownSample",
    "UpSample",
    "torch_conv_kernel_init",
    "torch_conv_bias_init",
    "torch_linear_kernel_init",
    "torch_linear_bias_init",
]

BN_MOMENTUM = 0.9  # torch momentum=0.1 => flax momentum = 1 - 0.1
BN_EPS = 1e-5


def _uniform_bound(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, minval=-bound, maxval=bound)


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv2d default: kaiming_uniform(a=sqrt(5)).

    flax kernel shape is (kh, kw, in, out); fan_in = kh*kw*in.
    bound = gain*sqrt(3/fan_in) with gain=sqrt(2/(1+5)) -> 1/sqrt(fan_in).
    """
    fan_in = int(np.prod(shape[:-1]))
    return _uniform_bound(key, shape, dtype, 1.0 / np.sqrt(fan_in))


def torch_conv_bias_init_for(fan_in: int):
    bound = 1.0 / np.sqrt(fan_in)

    def init(key, shape, dtype=jnp.float32):
        return _uniform_bound(key, shape, dtype, bound)

    return init


def torch_conv_bias_init(key, shape, dtype=jnp.float32):  # pragma: no cover
    raise RuntimeError("use torch_conv_bias_init_for(fan_in)")


def torch_linear_kernel_init(key, shape, dtype=jnp.float32):
    """torch Linear default; flax kernel shape is (in, out), fan_in = in."""
    fan_in = shape[0]
    return _uniform_bound(key, shape, dtype, 1.0 / np.sqrt(fan_in))


def torch_linear_bias_init_for(fan_in: int):
    return torch_conv_bias_init_for(fan_in)


def conv3x3(features: int, in_features: int, name: str, dtype=None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        padding=((1, 1), (1, 1)),
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_conv_bias_init_for(9 * in_features),
        dtype=dtype,
        name=name,
    )


def conv1x1(features: int, in_features: int, name: str, dtype=None) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        kernel_init=torch_conv_kernel_init,
        bias_init=torch_conv_bias_init_for(in_features),
        dtype=dtype,
        name=name,
    )


def batch_norm(name: str, axis_name: str | None = None, dtype=None) -> nn.BatchNorm:
    return nn.BatchNorm(
        momentum=BN_MOMENTUM,
        epsilon=BN_EPS,
        axis_name=axis_name,
        dtype=dtype,
        name=name,
    )


class DoubleConv(nn.Module):
    """(3x3 conv -> BN -> ReLU) x2 (ref: UG_unet_parts.py:5-19)."""

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None  # compute dtype; None=f32, jnp.bfloat16 for TPU fast path
    use_bn: bool = True  # False = BN-folded inference (models/folding.py)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        in1 = x.shape[-1]
        x = conv3x3(self.out_channels, in1, "conv1", self.dtype)(x)
        if self.use_bn:
            x = batch_norm("bn1", self.axis_name, self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        x = conv3x3(self.out_channels, self.out_channels, "conv2", self.dtype)(x)
        if self.use_bn:
            x = batch_norm("bn2", self.axis_name, self.dtype)(x, use_running_average=not train)
        x = nn.relu(x)
        return x


class InConv(nn.Module):
    """Entry block = one DoubleConv (ref: UG_unet_parts.py:21-28)."""

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return DoubleConv(self.out_channels, self.axis_name, self.dtype, self.use_bn, name="conv")(x, train)


class Down(nn.Module):
    """MaxPool(2) -> DoubleConv (ref: UG_unet_parts.py:44-54)."""

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return DoubleConv(self.out_channels, self.axis_name, self.dtype, self.use_bn, name="conv")(x, train)


class Up(nn.Module):
    """Bilinear x2 upsample (align_corners) -> concat [skip, up] -> DoubleConv.

    Channel order matches torch.cat([x2, x1], dim=1) (ref:
    UG_unet_parts.py:70-81) so name-keyed weight transfer stays aligned.
    """

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        x1 = upsample2x_bilinear_align_corners(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return DoubleConv(self.out_channels, self.axis_name, self.dtype, self.use_bn, name="conv")(x, train)


class OutConv(nn.Module):
    """1x1 conv logits head (ref: UG_unet_parts.py:84-91).

    Always computes in float32: the multi-scale head sums and downstream
    sigmoid/loss math stay full-precision even on the bf16 fast path.
    """

    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        return conv1x1(self.num_classes, x.shape[-1], "conv", jnp.float32)(x)


class DownSample(nn.Module):
    """Legacy: DoubleConv -> MaxPool, returns (pre_pool, pooled).

    Used only by the legacy ``UNet`` (ref: UG_unet_parts.py:31-41).
    """

    out_channels: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        down = DoubleConv(self.out_channels, self.axis_name, name="conv")(x, train)
        pooled = nn.max_pool(down, window_shape=(2, 2), strides=(2, 2))
        return down, pooled


class UpSample(nn.Module):
    """Legacy: ConvTranspose(k2, s2, halving channels) -> concat -> DoubleConv.

    (ref: UG_unet_parts.py:57-67); concat order [x1_up, x2].
    """

    out_channels: int
    axis_name: str | None = None

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        in_ch = x1.shape[-1]
        x1 = nn.ConvTranspose(
            in_ch // 2,
            kernel_size=(2, 2),
            strides=(2, 2),
            kernel_init=torch_conv_kernel_init,
            bias_init=torch_conv_bias_init_for(4 * (in_ch // 2)),
            name="up",
        )(x1)
        x = jnp.concatenate([x1, x2], axis=-1)
        return DoubleConv(self.out_channels, self.axis_name, name="conv")(x, train)

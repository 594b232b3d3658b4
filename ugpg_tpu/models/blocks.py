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
    "TorchBatchNorm",
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


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch-exact running-stat semantics.

    Differs from ``flax.linen.BatchNorm`` in one observable way: torch's
    BatchNorm2d normalizes with the *biased* batch variance but stores the
    *unbiased* (Bessel-corrected, n/(n-1)) estimate in ``running_var``
    (ref: UG_unet_parts.py:11,14 use nn.BatchNorm2d defaults).  flax stores
    the biased variance, which makes eval-mode forwards drift from a torch
    model trained on identical data.  Training-trajectory parity with the
    reference requires the torch convention, so this module applies the
    correction before the EMA update.

    Param/collection names match flax (params: scale/bias; batch_stats:
    mean/var) so checkpoints, weight transfer, torch import, and BN folding
    are unaffected.  Statistics are computed in f32 even on the bf16 path
    (as flax does); ``axis_name`` syncs batch statistics across a mesh axis
    under shard_map/pmap, with n scaled by the axis size.
    """

    momentum: float = BN_MOMENTUM
    epsilon: float = BN_EPS
    axis_name: str | None = None
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array, use_running_average: bool) -> jax.Array:
        features = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((features,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((features,), jnp.float32)
        )

        if use_running_average:
            mean, var = ra_mean.value, ra_var.value
        else:
            xf = x.astype(jnp.float32)
            red = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=red)
            mean2 = jnp.mean(jnp.square(xf), axis=red)
            n = float(np.prod([x.shape[i] for i in red]))
            if self.axis_name is not None:
                mean = jax.lax.pmean(mean, self.axis_name)
                mean2 = jax.lax.pmean(mean2, self.axis_name)
                n = n * jax.lax.psum(1, self.axis_name)
            var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
            if not self.is_initializing():
                unbiased = var * (n / jnp.maximum(n - 1.0, 1.0))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        out_dtype = self.dtype or x.dtype
        inv = jax.lax.rsqrt(var + self.epsilon) * scale
        y = (x.astype(jnp.float32) - mean) * inv + bias
        return y.astype(out_dtype)


def batch_norm(name: str, axis_name: str | None = None, dtype=None) -> TorchBatchNorm:
    return TorchBatchNorm(
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


def _double_conv(out_channels, axis_name, dtype, use_bn, remat, name):
    """DoubleConv, optionally rematerialized (``jax.checkpoint``).

    With ``remat=True`` the block's internal activations (two conv outputs,
    BN/ReLU intermediates) are NOT saved for the backward pass — they are
    recomputed from the block input during backprop, trading one extra
    forward's FLOPs for peak-activation memory.  This is the lever for
    native-resolution (whole-slide) training where per-sample activations,
    not parameters, bound the batch size.  The lifted transform preserves
    the param/batch_stats tree (same ``conv/...`` names), so checkpoints,
    weight transfer, and torch import are unaffected; gradients and BN
    running-stat updates are bit-identical to the non-remat path (same ops,
    same order).
    """
    cls = nn.remat(DoubleConv, static_argnums=(2,)) if remat else DoubleConv
    return cls(out_channels, axis_name, dtype, use_bn, name=name)


class InConv(nn.Module):
    """Entry block = one DoubleConv (ref: UG_unet_parts.py:21-28)."""

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        return _double_conv(self.out_channels, self.axis_name, self.dtype, self.use_bn, self.remat, "conv")(x, train)


class Down(nn.Module):
    """MaxPool(2) -> DoubleConv (ref: UG_unet_parts.py:44-54)."""

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
        return _double_conv(self.out_channels, self.axis_name, self.dtype, self.use_bn, self.remat, "conv")(x, train)


class Up(nn.Module):
    """Bilinear x2 upsample (align_corners) -> concat [skip, up] -> DoubleConv.

    Channel order matches torch.cat([x2, x1], dim=1) (ref:
    UG_unet_parts.py:70-81) so name-keyed weight transfer stays aligned.
    """

    out_channels: int
    axis_name: str | None = None
    dtype: Any = None
    use_bn: bool = True
    remat: bool = False

    @nn.compact
    def __call__(self, x1: jax.Array, x2: jax.Array, train: bool = False) -> jax.Array:
        x1 = upsample2x_bilinear_align_corners(x1)
        x = jnp.concatenate([x2, x1], axis=-1)
        return _double_conv(self.out_channels, self.axis_name, self.dtype, self.use_bn, self.remat, "conv")(x, train)


class _Head1x1(nn.Module):
    """1x1 head as an explicit f32 contraction, param-compatible with nn.Conv.

    Owns ``kernel`` (1,1,C,K) / ``bias`` (K,) under the same names, shapes,
    and initializers as the ``nn.Conv`` it replaces, so checkpoints, weight
    transfer, torch import, and BN folding are unaffected.

    ``squeezed=True`` (K==1 only) returns (N,H,W) instead of (N,H,W,1):
    size-1-channel NHWC tensors get degenerate T(1,128) tilings on TPU
    (the 128-lane axis carries one useful element), so single-class head
    sums/resizes run channel-squeezed.  End-to-end flagship effect was
    measured neutral (XLA was already fusing the expanded chain well —
    the head fusion is bound by reading its 64-ch input, not by the
    degenerate output tiles), but the squeezed form keeps the multi-scale
    resizes on well-tiled (N,H,W) shapes by construction.
    """

    features: int

    @nn.compact
    def __call__(self, x: jax.Array, squeezed: bool = False) -> jax.Array:
        c = x.shape[-1]
        kernel = self.param(
            "kernel", torch_conv_kernel_init, (1, 1, c, self.features), jnp.float32
        )
        bias = self.param(
            "bias", torch_conv_bias_init_for(c), (self.features,), jnp.float32
        )
        xf = x.astype(jnp.float32)
        if squeezed:
            if self.features != 1:
                raise ValueError("squeezed head requires num_classes == 1")
            return jnp.einsum("nhwc,c->nhw", xf, kernel[0, 0, :, 0]) + bias[0]
        return jnp.einsum("nhwc,co->nhwo", xf, kernel[0, 0]) + bias


class OutConv(nn.Module):
    """1x1 conv logits head (ref: UG_unet_parts.py:84-91).

    Always computes in float32: the multi-scale head sums and downstream
    sigmoid/loss math stay full-precision even on the bf16 fast path.
    ``squeezed=True`` returns (N,H,W) for single-class heads — see _Head1x1.
    """

    num_classes: int

    @nn.compact
    def __call__(self, x: jax.Array, squeezed: bool = False) -> jax.Array:
        return _Head1x1(self.num_classes, name="conv")(x, squeezed)


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

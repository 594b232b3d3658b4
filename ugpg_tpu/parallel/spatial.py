"""Spatially-sharded (halo-exchange) inference: whole-slide images over ICI.

NEW capability beyond the reference (SURVEY.md §2h lists SP as absent /
"only if scaling beyond single-chip images"): the reference downsizes every
MoNuSeg tile from 1000x1000 to <=256px before inference
(ref: MoNuSegImprove/test_monuseg.py:164-201), losing nuclei-scale detail.
This module runs a PGUNet stage on the FULL-resolution image by sharding the
spatial axes across the device mesh and exchanging 1-pixel halos over ICI —
the TPU-native analog of context/sequence parallelism for a CNN (SURVEY §5
"spatial sharding with halo exchange via shard_map").

Sharding layout: H over the 'data' axis and (optionally) W over the 'model'
axis — a 2-D spatial grid, so per-chip memory scales as H*W/(n_h*n_w) and
neither slide dimension is capped by a single chip's activation rows.

Why 1-pixel halos suffice everywhere:

* 3x3 convs need exactly one neighbor row/column.  The exchange is
  SEQUENTIAL: H halos first (rows spanning the local W range), then W halos
  of the H-extended block — the W-neighbor's extended block already contains
  its own H halos, so corner pixels from diagonal shards arrive without a
  dedicated diagonal exchange (standard 2-phase halo pattern).  Boundary
  shards receive zeros, which IS the conv zero-pad.
* 2x2/2 max-pool needs none (per-shard extents stay even).
* every resize in this network is bilinear align_corners=True — a TWO-TAP
  interpolation at any scale: output row ``o`` reads input rows
  ``floor(src)`` and ``floor(src)+1`` with ``src = o*(h_in-1)/(h_out-1)``.
  With both sides sharded evenly, output shard i's taps live in input shard
  i's rows +-1 — statically verified per call in ``_axis_resize_matrix``.
* BatchNorm (eval mode) and heads are per-channel pointwise.

Everything is jit/shard_map — XLA schedules the ppermutes over ICI; no
hand-written collectives beyond the halo pattern itself.

Arbitrary slide sizes (e.g. MoNuSeg's 1000x1000) go through
``pad_to_divisible`` + ``spatial_predict(..., pad=True)``: the image is
zero-padded up to the divisibility constraint (shards * 2^pools per axis),
inferred, and the outputs cropped back — identical semantics to running the
unsharded model on the same padded image and cropping.

Numerics match the unsharded ``PGUNetN.apply(..., train=False)`` to f32
round-off (the per-axis resize einsum is evaluated against an identical
weight matrix, sliced per shard); see tests/test_spatial.py.
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugpg_tpu.models.blocks import BN_EPS
from ugpg_tpu.ops.resize import _bilinear_ac_matrix

__all__ = [
    "spatial_stage_infer",
    "make_spatial_infer",
    "spatial_predict",
    "pad_to_divisible",
    "spatial_divisor",
]


def _halo_slices(x: jax.Array, axis_name: str, size: int, dim: int):
    """(before, after) 1-slice halos from the neighbors along ``dim``.

    before[i] = last slice of shard i-1; after[i] = first slice of shard
    i+1.  Boundary shards receive zeros (ppermute semantics) — exactly the
    conv zero-padding / zero-weight resize taps they need.
    """
    first = [slice(None)] * x.ndim
    last = [slice(None)] * x.ndim
    first[dim] = slice(0, 1)
    last[dim] = slice(x.shape[dim] - 1, x.shape[dim])
    if size == 1:
        zero = jnp.zeros_like(x[tuple(first)])
        return zero, zero
    down = [(j, j + 1) for j in range(size - 1)]
    up = [(j + 1, j) for j in range(size - 1)]
    before = jax.lax.ppermute(x[tuple(last)], axis_name, down)
    after = jax.lax.ppermute(x[tuple(first)], axis_name, up)
    return before, after


def _with_halo(x: jax.Array, axis_name: str, size: int, dim: int) -> jax.Array:
    before, after = _halo_slices(x, axis_name, size, dim)
    return jnp.concatenate([before, x, after], axis=dim)


class _Grid:
    """Static description of the (H, W) shard grid inside shard_map."""

    def __init__(self, h_axis: str, h_size: int, w_axis: str | None, w_size: int):
        self.h_axis, self.h_size = h_axis, h_size
        self.w_axis, self.w_size = w_axis, w_size

    def with_halo2d(self, x: jax.Array) -> jax.Array:
        """H halos first, then W halos of the H-extended block (carries the
        diagonal corners — see module docstring)."""
        x = _with_halo(x, self.h_axis, self.h_size, 1)
        if self.w_size > 1:
            x = _with_halo(x, self.w_axis, self.w_size, 2)
        return x

    def w_padding(self):
        # W unsharded: let the conv zero-pad; W sharded: halo columns
        # already concatenated, conv runs valid on that dim
        return (0, 0) if self.w_size > 1 else (1, 1)


def _conv3x3_halo(x, kernel, bias, grid: _Grid, dtype):
    """3x3 conv, stride 1, torch 'pad 1' semantics across shard boundaries."""
    xp = grid.with_halo2d(x).astype(dtype)
    y = jax.lax.conv_general_dilated(
        xp,
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=((0, 0), grid.w_padding()),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _bn_eval(x, params, stats, dtype):
    """TorchBatchNorm eval path (running stats, f32 math)."""
    inv = jax.lax.rsqrt(stats["var"] + BN_EPS) * params["scale"]
    y = (x.astype(jnp.float32) - stats["mean"]) * inv + params["bias"]
    return y.astype(dtype)


def _double_conv(x, p, s, grid: _Grid, dtype):
    x = _conv3x3_halo(x, p["conv1"]["kernel"], p["conv1"]["bias"], grid, dtype)
    x = jax.nn.relu(_bn_eval(x, p["bn1"], s["bn1"], dtype))
    x = _conv3x3_halo(x, p["conv2"]["kernel"], p["conv2"]["bias"], grid, dtype)
    return jax.nn.relu(_bn_eval(x, p["bn2"], s["bn2"], dtype))


def _max_pool2(x):
    from flax import linen as nn

    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


@functools.lru_cache(maxsize=None)
def _axis_resize_matrix(n_in: int, n_out: int, shards: int) -> np.ndarray:
    """Halo-padded per-shard resize weights for one axis, statically
    tap-checked.

    Returns Wp of shape (n_out, n_in + 2) with Wp[:, 1:n_in+1] = the global
    align_corners=True matrix; shard i applies
    ``Wp[i*Lo:(i+1)*Lo, i*L : i*L + L + 2]`` to its halo-padded extent.
    Raises at trace time if any output element's taps leave the 1-px halo.
    """
    if n_in % shards or n_out % shards:
        raise ValueError(f"axis {n_in}->{n_out} not divisible by {shards} shards")
    w = _bilinear_ac_matrix(n_in, n_out)  # (n_out, n_in)
    wp = np.zeros((n_out, n_in + 2), dtype=np.float32)
    wp[:, 1 : n_in + 1] = w
    lo, lo_out = n_in // shards, n_out // shards
    for i in range(shards):
        block = wp[i * lo_out : (i + 1) * lo_out]
        cols = np.nonzero(np.abs(block).sum(axis=0) > 0)[0]
        if cols.size and (cols.min() < i * lo or cols.max() >= i * lo + lo + 2):
            raise ValueError(
                f"resize {n_in}->{n_out}: shard {i} taps outside 1-px halo"
            )
    return wp


def _resize_axis_sharded(y, out_n, axis_name, size, dim, eq):
    """One sharded-axis bilinear resize: per-shard slice of the halo-padded
    global interpolation matrix, applied to the halo-extended local block."""
    n = y.shape[dim] * size
    wp = jnp.asarray(_axis_resize_matrix(n, out_n, size))
    i = jax.lax.axis_index(axis_name)
    lo_out = out_n // size
    wloc = jax.lax.dynamic_slice(
        wp, (i * lo_out, i * y.shape[dim]), (lo_out, y.shape[dim] + 2)
    )
    yp = _with_halo(y, axis_name, size, dim)
    return jnp.einsum(eq, wloc, yp, precision=jax.lax.Precision.HIGHEST)


def _resize_halo(x, out_hw, grid: _Grid):
    """Bilinear align_corners=True resize of grid-sharded NHWC x (f32 math).

    Each sharded axis applies a per-shard slice of the halo-padded global
    interpolation matrix; unsharded axes use the plain einsum (same
    matrices as ops/resize.py).  ``out_hw`` is the GLOBAL output size.
    """
    out_h, out_w = out_hw
    n, l, w, c = x.shape
    h_glob = l * grid.h_size
    w_glob = w * grid.w_size
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if out_h != h_glob:
        y = _resize_axis_sharded(
            y, out_h, grid.h_axis, grid.h_size, 1, "ol,nlwc->nowc"
        )
    if out_w != w_glob:
        if grid.w_size > 1:
            y = _resize_axis_sharded(
                y, out_w, grid.w_axis, grid.w_size, 2, "pl,nhlc->nhpc"
            )
        else:
            ww = jnp.asarray(_bilinear_ac_matrix(w, out_w))
            y = jnp.einsum("pw,nhwc->nhpc", ww, y,
                           precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


def _head(x, p):
    """OutConv: 1x1 f32 head (matches models/blocks._Head1x1 math)."""
    return (
        jnp.einsum("nhwc,co->nhwo", x.astype(jnp.float32), p["kernel"][0, 0])
        + p["bias"]
    )


def _stage_forward(stage: int, params, stats, x, grid: _Grid, dtype):
    dc = lambda t, name: _double_conv(
        t, params[name]["conv"], stats[name]["conv"], grid, dtype
    )
    up2 = lambda t: _resize_halo(
        t, (t.shape[1] * grid.h_size * 2, t.shape[2] * grid.w_size * 2), grid
    )
    up_to = lambda o, hw: _resize_halo(o, hw, grid)

    if dtype is not None:
        x = x.astype(dtype)
    if stage == 1:
        x1 = dc(x, "inc")
        x2 = dc(_max_pool2(x1), "down4")
        x3 = dc(jnp.concatenate([x1, up2(x2)], axis=-1), "up1")
        return _head(x3, params["outc"]["conv"])
    if stage == 2:
        x1 = dc(x, "inc")
        x2 = dc(_max_pool2(x1), "down3")
        x3 = dc(_max_pool2(x2), "down4")
        x4 = dc(jnp.concatenate([x2, up2(x3)], axis=-1), "up1")
        x5 = dc(jnp.concatenate([x1, up2(x4)], axis=-1), "up2")
        hw = (x5.shape[1] * grid.h_size, x5.shape[2] * grid.w_size)
        o1 = _head(x4, params["outc1"]["conv"])
        o2 = _head(x5, params["outc2"]["conv"])
        return up_to(o1, hw) + o2
    if stage == 3:
        x1 = dc(x, "inc")
        x2 = dc(_max_pool2(x1), "down2")
        x3 = dc(_max_pool2(x2), "down3")
        x4 = dc(_max_pool2(x3), "down4")
        x5 = dc(jnp.concatenate([x3, up2(x4)], axis=-1), "up1")
        x6 = dc(jnp.concatenate([x2, up2(x5)], axis=-1), "up2")
        x7 = dc(jnp.concatenate([x1, up2(x6)], axis=-1), "up3")
        hw = (x7.shape[1] * grid.h_size, x7.shape[2] * grid.w_size)
        o = up_to(_head(x5, params["outc1"]["conv"]), hw)
        o = o + up_to(_head(x6, params["outc2"]["conv"]), hw)
        return o + _head(x7, params["outc3"]["conv"])
    if stage == 4:
        x1 = dc(x, "inc")
        x2 = dc(_max_pool2(x1), "down1")
        x3 = dc(_max_pool2(x2), "down2")
        x4 = dc(_max_pool2(x3), "down3")
        x5 = dc(_max_pool2(x4), "down4")
        x6 = dc(jnp.concatenate([x4, up2(x5)], axis=-1), "up1")
        x7 = dc(jnp.concatenate([x3, up2(x6)], axis=-1), "up2")
        x8 = dc(jnp.concatenate([x2, up2(x7)], axis=-1), "up3")
        x9 = dc(jnp.concatenate([x1, up2(x8)], axis=-1), "up4")
        hw = (x9.shape[1] * grid.h_size, x9.shape[2] * grid.w_size)
        o = up_to(_head(x6, params["outc1"]["conv"]), hw)
        o = o + up_to(_head(x7, params["outc2"]["conv"]), hw)
        o = o + up_to(_head(x8, params["outc3"]["conv"]), hw)
        return o + _head(x9, params["outc4"]["conv"])
    raise ValueError(f"stage must be 1..4, got {stage}")


def _n_pools(stage: int) -> int:
    return 1 if stage == 1 else stage


def spatial_divisor(stage: int, mesh: Mesh, axis: str = "data",
                    w_axis: str | None = None) -> tuple[int, int]:
    """(h_div, w_div): each input axis must be a multiple of
    ``shards * 2**pools`` so per-shard extents stay even through the pool
    pyramid and resize taps stay within 1-px halos."""
    pools = _n_pools(stage)
    h_div = mesh.shape[axis] * 2**pools
    w_div = (mesh.shape[w_axis] if w_axis else 1) * 2**pools
    return h_div, w_div


def pad_to_divisible(images: np.ndarray | jax.Array, stage: int, mesh: Mesh,
                     axis: str = "data", w_axis: str | None = None):
    """Zero-pad (bottom/right) an NHWC batch up to the spatial divisibility
    constraint.  Returns ``(padded, (orig_h, orig_w))``; crop model outputs
    back with ``out[:, :orig_h, :orig_w]``.  Zero padding matches the
    conv/halo boundary semantics (the unsharded model on the same padded
    image produces identical cropped outputs)."""
    h, w = images.shape[1], images.shape[2]
    h_div, w_div = spatial_divisor(stage, mesh, axis, w_axis)
    ph = (-h) % h_div
    pw = (-w) % w_div
    if ph or pw:
        images = jnp.pad(images, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return images, (h, w)


def make_spatial_infer(stage: int, mesh: Mesh, axis: str = "data",
                       dtype: Any = None, w_axis: str | None = None):
    """Build a jitted spatially-sharded forward: (variables, x) -> logits.

    ``x`` is the full (N, H, W, C) image batch; H must be divisible by
    ``mesh.shape[axis] * 2**pools`` (pools: stage 1 -> 1, stage N -> N),
    and — when ``w_axis`` names a second mesh axis — W likewise by
    ``mesh.shape[w_axis] * 2**pools`` (use ``pad_to_divisible`` for
    arbitrary sizes).  Variables are replicated; activations are sharded on
    H (and W); the returned logits are sharded the same way, f32
    (N, H, W, K).  Eval-mode BatchNorm (running stats), matching
    ``PGUNetN.apply(..., train=False)``.
    """
    h_size = mesh.shape[axis]
    w_size = mesh.shape[w_axis] if w_axis else 1
    grid = _Grid(axis, h_size, w_axis, w_size)
    fwd = functools.partial(_stage_forward, stage, grid=grid, dtype=dtype)
    spec = P(None, axis, w_axis) if w_axis else P(None, axis)

    @jax.jit
    def infer(variables: Mapping[str, Any], x: jax.Array) -> jax.Array:
        pools = _n_pools(stage)
        if x.shape[1] % (h_size * 2**pools) or x.shape[2] % (w_size * 2**pools):
            raise ValueError(
                f"(H, W)={x.shape[1:3]} not divisible by shards*2^pools "
                f"({h_size}*{2**pools}, {w_size}*{2**pools}); "
                "use pad_to_divisible"
            )
        sharded = jax.shard_map(
            lambda v, t: fwd(v["params"], v["batch_stats"], t),
            mesh=mesh,
            in_specs=(P(), spec),
            out_specs=spec,
        )
        return sharded(variables, x)

    return infer


def spatial_stage_infer(
    variables, x, stage: int, mesh: Mesh, axis: str = "data", dtype: Any = None,
    w_axis: str | None = None,
) -> jax.Array:
    """One-shot convenience wrapper over ``make_spatial_infer``."""
    return make_spatial_infer(stage, mesh, axis, dtype, w_axis)(variables, x)


def spatial_predict(
    variables, x, mesh: Mesh, stage: int = 4, axis: str = "data",
    dtype: Any = None, w_axis: str | None = None, pad: bool = False,
):
    """(preds, probs, uncertainty) for a whole-slide batch, grid-sharded.

    Pointwise tail (sigmoid / threshold / 1-2|p-.5|) runs shard-local under
    the same jit; binary heads only.  ``pad=True`` accepts arbitrary
    (H, W): the batch is zero-padded to the divisibility constraint and all
    outputs cropped back to the original size.
    """
    from ugpg_tpu.uncertainty import binary_uncertainty

    orig = None
    if pad:
        x, orig = pad_to_divisible(x, stage, mesh, axis, w_axis)
    logits = spatial_stage_infer(variables, x, stage, mesh, axis, dtype, w_axis)
    probs = jax.nn.sigmoid(logits)
    preds = (probs > 0.5).astype(jnp.float32)
    unc = binary_uncertainty(probs)
    if orig is not None:
        h, w = orig
        preds, probs, unc = (t[:, :h, :w] for t in (preds, probs, unc))
    return preds, probs, unc

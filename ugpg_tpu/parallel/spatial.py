"""Spatially-sharded (halo-exchange) inference AND training over ICI.

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

TRAINING at native resolution: ``make_spatial_train_step`` /
``make_spatial_eval_step`` run the full uncertainty-guided train step
(frozen prev-stage forward + weighted BCE + grads + optimizer) on the same
grid — global-batch BatchNorm via psum, halo exchange differentiated by
shard_map's transpose, loss/metrics as global means.  Reproduces the
unsharded ``train.steps.make_seg_train_step`` numerics on identical batches
(tests/test_spatial_train.py).
"""

from __future__ import annotations

import functools
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ugpg_tpu.models.blocks import BN_EPS, BN_MOMENTUM
from ugpg_tpu.ops.losses import bce_with_logits
from ugpg_tpu.ops.resize import _bilinear_ac_matrix
from ugpg_tpu.uncertainty import binary_uncertainty

__all__ = [
    "spatial_stage_infer",
    "make_spatial_infer",
    "spatial_predict",
    "pad_to_divisible",
    "spatial_divisor",
    "make_spatial_train_step",
    "make_spatial_eval_step",
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


def _bn_train(x, params, running, grid: _Grid, dtype):
    """Train-mode BN with GLOBAL batch statistics (psum over the grid axes).

    Matches models/blocks.TorchBatchNorm on the full unsharded image
    exactly: biased variance normalizes, the unbiased (Bessel-corrected)
    estimate updates ``running_var``, momentum 0.9 EMA, f32 math.  Equal
    per-shard extents make pmean-of-local-means the global mean.
    """
    axes = (grid.h_axis,) + ((grid.w_axis,) if grid.w_size > 1 else ())
    xf = x.astype(jnp.float32)
    mean = jax.lax.pmean(jnp.mean(xf, axis=(0, 1, 2)), axes)
    mean2 = jax.lax.pmean(jnp.mean(jnp.square(xf), axis=(0, 1, 2)), axes)
    n = float(x.shape[0] * x.shape[1] * x.shape[2] * grid.h_size * grid.w_size)
    var = jnp.maximum(mean2 - jnp.square(mean), 0.0)
    unbiased = var * (n / max(n - 1.0, 1.0))
    m = BN_MOMENTUM
    new_stats = {
        "mean": m * running["mean"] + (1.0 - m) * mean,
        "var": m * running["var"] + (1.0 - m) * unbiased,
    }
    inv = jax.lax.rsqrt(var + BN_EPS) * params["scale"]
    y = (xf - mean) * inv + params["bias"]
    return y.astype(dtype if dtype is not None else x.dtype), new_stats


def _double_conv_train(x, p, s, grid: _Grid, dtype):
    x = _conv3x3_halo(x, p["conv1"]["kernel"], p["conv1"]["bias"], grid, dtype)
    x, n1 = _bn_train(x, p["bn1"], s["bn1"], grid, dtype)
    x = jax.nn.relu(x)
    x = _conv3x3_halo(x, p["conv2"]["kernel"], p["conv2"]["bias"], grid, dtype)
    x, n2 = _bn_train(x, p["bn2"], s["bn2"], grid, dtype)
    return jax.nn.relu(x), {"bn1": n1, "bn2": n2}


def _max_pool2(x):
    from flax import linen as nn

    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


@functools.lru_cache(maxsize=None)
def _axis_resize_bands(n_in: int, n_out: int, shards: int) -> np.ndarray:
    """Per-shard halo-padded resize bands for one axis, statically
    tap-checked.

    Returns W of shape (shards, n_out/shards, n_in/shards + 2): band i is
    the slab of the global align_corners=True matrix that shard i applies
    to its halo-extended local extent.  Stacking only the BANDS (not the
    dense global matrix) keeps the replicated per-chip constant at
    O(n_out * n_in / shards) — it shrinks as the grid grows, instead of
    re-capping the slide size the module exists to remove.  Raises at trace
    time if any output element's taps leave the 1-px halo.
    """
    if n_in % shards or n_out % shards:
        raise ValueError(f"axis {n_in}->{n_out} not divisible by {shards} shards")
    w = _bilinear_ac_matrix(n_in, n_out)  # (n_out, n_in)
    wp = np.zeros((n_out, n_in + 2), dtype=np.float32)
    wp[:, 1 : n_in + 1] = w
    lo, lo_out = n_in // shards, n_out // shards
    bands = []
    for i in range(shards):
        block = wp[i * lo_out : (i + 1) * lo_out]
        cols = np.nonzero(np.abs(block).sum(axis=0) > 0)[0]
        if cols.size and (cols.min() < i * lo or cols.max() >= i * lo + lo + 2):
            raise ValueError(
                f"resize {n_in}->{n_out}: shard {i} taps outside 1-px halo"
            )
        bands.append(block[:, i * lo : i * lo + lo + 2])
    return np.stack(bands)


def _resize_axis_sharded(y, out_n, axis_name, size, dim, eq):
    """One sharded-axis bilinear resize: this shard's band of the global
    interpolation matrix, applied to the halo-extended local block."""
    n = y.shape[dim] * size
    bands = jnp.asarray(_axis_resize_bands(n, out_n, size))
    i = jax.lax.axis_index(axis_name)
    wloc = jax.lax.dynamic_index_in_dim(bands, i, axis=0, keepdims=False)
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


def _stage_topology(stage: int, params, x, dc, grid: _Grid):
    """PGUNet stage topology over an abstract DoubleConv ``dc(t, name)`` —
    shared by the eval (running-stat BN) and train (global-batch BN)
    forwards; heads/pool/resize carry no train/eval state."""
    up2 = lambda t: _resize_halo(
        t, (t.shape[1] * grid.h_size * 2, t.shape[2] * grid.w_size * 2), grid
    )
    up_to = lambda o, hw: _resize_halo(o, hw, grid)

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


def _stage_forward(stage: int, params, stats, x, grid: _Grid, dtype):
    """Eval-mode forward (running-stat BN), matching
    ``PGUNetN.apply(..., train=False)``."""
    if dtype is not None:
        x = x.astype(dtype)
    dc = lambda t, name: _double_conv(
        t, params[name]["conv"], stats[name]["conv"], grid, dtype
    )
    return _stage_topology(stage, params, x, dc, grid)


def _stage_forward_train(stage: int, params, stats, x, grid: _Grid, dtype):
    """Train-mode forward: global-batch BN via psum over the grid; returns
    (logits, new_batch_stats) with the same tree structure as the
    ``batch_stats`` collection (matching ``mutable=['batch_stats']``)."""
    if dtype is not None:
        x = x.astype(dtype)
    collected: dict[str, Any] = {}

    def dc(t, name):
        y, ns = _double_conv_train(
            t, params[name]["conv"], stats[name]["conv"], grid, dtype
        )
        collected[name] = {"conv": ns}
        return y

    logits = _stage_topology(stage, params, x, dc, grid)
    return logits, collected


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


def _check_divisible(stage, x, h_size, w_size):
    pools = _n_pools(stage)
    if x.shape[1] % (h_size * 2**pools) or x.shape[2] % (w_size * 2**pools):
        raise ValueError(
            f"(H, W)={x.shape[1:3]} not divisible by shards*2^pools "
            f"({h_size}*{2**pools}, {w_size}*{2**pools}); use pad_to_divisible"
        )


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

    Memoized per (stage, mesh, axis, dtype, w_axis): repeated calls — e.g.
    one per slide in ``evaluate_dataset_native`` — reuse ONE jit wrapper
    (and therefore its compile cache) instead of re-tracing per call.
    """
    return _make_spatial_infer(stage, mesh, axis, dtype, w_axis)


@functools.lru_cache(maxsize=None)
def _make_spatial_infer(stage, mesh, axis, dtype, w_axis):
    h_size = mesh.shape[axis]
    w_size = mesh.shape[w_axis] if w_axis else 1
    grid = _Grid(axis, h_size, w_axis, w_size)
    fwd = functools.partial(_stage_forward, stage, grid=grid, dtype=dtype)
    spec = P(None, axis, w_axis) if w_axis else P(None, axis)

    @jax.jit
    def infer(variables: Mapping[str, Any], x: jax.Array) -> jax.Array:
        _check_divisible(stage, x, h_size, w_size)
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

    Pointwise tail (sigmoid / threshold / 1-2|p-.5|) runs inside the same
    memoized jit as the forward; binary heads only.  ``pad=True`` accepts
    arbitrary (H, W): the batch is zero-padded to the divisibility
    constraint and all outputs cropped back to the original size.
    """
    orig = None
    if pad:
        x, orig = pad_to_divisible(x, stage, mesh, axis, w_axis)
    preds, probs, unc = _make_spatial_predict(stage, mesh, axis, dtype, w_axis)(
        variables, x
    )
    if orig is not None:
        h, w = orig
        preds, probs, unc = (t[:, :h, :w] for t in (preds, probs, unc))
    return preds, probs, unc


@functools.lru_cache(maxsize=None)
def _make_spatial_predict(stage, mesh, axis, dtype, w_axis):
    infer = _make_spatial_infer(stage, mesh, axis, dtype, w_axis)

    @jax.jit
    def predict(variables, x):
        probs = jax.nn.sigmoid(infer(variables, x))
        preds = (probs > 0.5).astype(jnp.float32)
        return preds, probs, binary_uncertainty(probs)

    return predict


# ---------------------------------------------------------------------------
# Spatially-sharded TRAINING: native-resolution train/eval steps.
#
# NEW capability past both the reference and the DP/TP trainers (SURVEY §2h,
# §5 "long-context analog"): train on whole-slide images too large for one
# chip's activation memory by sharding H (and W) over the mesh.  The halo
# exchange runs in the forward AND — via autodiff of shard_map/ppermute —
# the backward pass (the transpose of a halo push is the halo pull of the
# cotangent; XLA schedules both over ICI).  BatchNorm uses GLOBAL batch
# statistics (psum over the grid), and loss/metrics are global means, so a
# spatial step reproduces the unsharded ``make_seg_train_step`` numerics on
# the same batch (tests/test_spatial_train.py) — the grid is a memory/
# throughput layout choice, not a semantics change.
# ---------------------------------------------------------------------------


def _spatial_unc_map(prev_stage, prev_variables, x, grid: _Grid, dtype,
                     factor: int):
    """Frozen prev-stage uncertainty map on the grid (ref: UG_unet.py:19-59):
    downsample to the previous stage's scale (``factor`` =
    2**(stage - prev_stage), matching the reference's prev_resolution —
    taps stay within the 1-px halo, statically checked), eval-mode forward,
    sigmoid, upsample, 1-2|P-.5|, stop_gradient."""
    hw = (x.shape[1] * grid.h_size, x.shape[2] * grid.w_size)
    x_prev = _resize_halo(
        x.astype(jnp.float32), (hw[0] // factor, hw[1] // factor), grid
    )
    prev_logits = _stage_forward(
        prev_stage, prev_variables["params"], prev_variables["batch_stats"],
        x_prev, grid, dtype,
    )
    probs_up = _resize_halo(
        jax.nn.sigmoid(prev_logits.astype(jnp.float32)), hw, grid
    )
    return jax.lax.stop_gradient(binary_uncertainty(probs_up))


def _spatial_metrics(logits, y, unc_map, axes):
    """Global (psum'd) train metrics matching train/steps.py exactly:
    smooth=1 per-sample Dice, pixel accuracy, uncertainty mean/std."""
    preds = (jax.nn.sigmoid(logits.astype(jnp.float32)) > 0.5).astype(
        jnp.float32
    )
    b = preds.shape[0]
    p2 = preds.reshape(b, -1)
    t2 = y.astype(jnp.float32).reshape(b, -1)
    inter = jax.lax.psum(jnp.sum(p2 * t2, axis=1), axes)
    sp = jax.lax.psum(jnp.sum(p2, axis=1), axes)
    st = jax.lax.psum(jnp.sum(t2, axis=1), axes)
    dice = jnp.mean((2.0 * inter + 1.0) / (sp + st + 1.0))
    acc = jax.lax.pmean(jnp.mean((p2 == t2).astype(jnp.float32)), axes)
    if unc_map is None:
        z = jnp.zeros((), jnp.float32)
        unc_mean = unc_std = z
    else:
        unc_mean = jax.lax.pmean(jnp.mean(unc_map), axes)
        # center BEFORE the second moment: the raw E[x^2]-E[x]^2 form
        # cancels catastrophically in f32 when the map is near-constant
        c2 = jax.lax.pmean(jnp.mean(jnp.square(unc_map - unc_mean)), axes)
        unc_std = jnp.sqrt(jnp.maximum(c2, 0.0))
    return dice, acc, unc_mean, unc_std


def _spatial_loss_and_metrics(logits, y, pos_weight, unc_map, alpha, axes):
    """Global (psum'd) uncertainty-weighted loss + metric dict, shared by
    the train and eval steps (same semantics as train/steps.py:
    ref UG_unet.py:61-94 weighting, smooth-1 Dice, pixel accuracy)."""
    pixel = bce_with_logits(logits, y, pos_weight)
    base = jax.lax.pmean(jnp.mean(pixel), axes)
    if unc_map is None:
        final = base
    else:
        w = jax.lax.stop_gradient(1.0 + alpha * unc_map)
        final = jax.lax.pmean(jnp.mean(pixel * w), axes)
    dice, acc, unc_mean, unc_std = _spatial_metrics(logits, y, unc_map, axes)
    return final, {
        "base_loss": base,
        "dice": dice,
        "accuracy": acc,
        "uncertainty_weight_mean": unc_mean,
        "uncertainty_weight_std": unc_std,
    }


def make_spatial_train_step(
    stage: int,
    mesh: Mesh,
    tx,
    axis: str = "data",
    w_axis: str | None = None,
    prev_stage: int | None = None,
    alpha: float = 1.0,
    dtype: Any = None,
    donate: bool = True,
    accum_steps: int = 1,
):
    """Build a jitted native-resolution spatially-sharded train step.

    ``step(state, prev_variables, batch, pos_weight) -> (state, metrics)``
    with ``state`` a ``train.steps.TrainState``, ``batch = (images NHWC,
    masks NHW1)`` at NATIVE resolution — both spatial extents divisible per
    ``spatial_divisor(stage, ...)`` (``pad_to_divisible`` for arbitrary
    sizes) — and ``prev_variables`` the frozen previous-stage tree
    ({} for stage 1).  Differences from ``make_seg_train_step``, by design:
    no in-graph resize to the stage resolution (native-res training is the
    point) and no on-device augmentation (rotations gather across shard
    boundaries; use the offline patch+aug pipeline, cli/augment_monuseg).
    Metrics match train/steps.py: same loss (ref: UG_unet.py:61-94), Dice,
    accuracy, uncertainty stats — as global psums.

    ``donate`` (default True, matching make_seg_train_step) recycles the
    input state's buffers in place — native-resolution activations are
    exactly where HBM is the binding constraint.  Pass donate=False to
    keep reusing a state object across calls.

    ``accum_steps=K``: gradient accumulation over the batch dimension —
    each (size K*m) batch runs as K sequential micro-batches, gradients
    average, BN stats thread sequentially, ONE optimizer update (same
    semantics as ``make_seg_train_step(accum_steps=...)``).  Native
    resolution is exactly where per-sample activations are largest, so
    this is how batch size scales past HBM on the spatial grid.
    """
    import optax

    from ugpg_tpu.train.steps import _accum_scan

    if accum_steps < 1:
        raise ValueError(f"accum_steps must be >= 1, got {accum_steps}")

    h_size = mesh.shape[axis]
    w_size = mesh.shape[w_axis] if w_axis else 1
    grid = _Grid(axis, h_size, w_axis, w_size)
    spec = P(None, axis, w_axis) if w_axis else P(None, axis)
    axes = (axis,) + ((w_axis,) if w_axis else ())
    use_unc = stage > 1 and prev_stage is not None
    unc_factor = 2 ** (stage - prev_stage) if use_unc else 1

    def local(params, batch_stats, prev_variables, x, y, pos_weight):
        unc_map = (
            _spatial_unc_map(prev_stage, prev_variables, x, grid, dtype,
                             unc_factor)
            if use_unc else None
        )
        logits, new_stats = _stage_forward_train(
            stage, params, batch_stats, x, grid, dtype
        )
        final, metrics = _spatial_loss_and_metrics(
            logits, y, pos_weight, unc_map, alpha, axes
        )
        return final, {"new_stats": new_stats, "metrics": metrics}

    sharded = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), spec, spec, P()),
        out_specs=(P(), P()),
    )

    def micro(params, batch_stats, prev_variables, x, y, pos_weight):
        def loss_fn(params):
            return sharded(params, batch_stats, prev_variables, x, y,
                           pos_weight)

        (final, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        metrics = dict(aux["metrics"], final_loss=final)
        return grads, aux["new_stats"], metrics

    def step(state, prev_variables, batch, pos_weight):
        x, y = batch
        _check_divisible(stage, x, h_size, w_size)
        x = jnp.asarray(x)
        y = jnp.asarray(y)
        pw = jnp.asarray(pos_weight, jnp.float32)
        if accum_steps == 1:
            grads, new_bs, metrics = micro(
                state.params, state.batch_stats, prev_variables, x, y, pw,
            )
        else:
            # rng=None: the spatial micro-step is deterministic (no
            # dropout/augmentation on the native-resolution path)
            grads, new_bs, metrics = _accum_scan(
                lambda p, bs, xm, ym: micro(
                    p, bs, prev_variables, xm, ym, pw
                ),
                state.params, state.batch_stats, (x, y),
                None, accum_steps,
            )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            state.replace(
                params=new_params,
                batch_stats=new_bs,
                opt_state=new_opt,
                step=state.step + 1,
            ),
            metrics,
        )

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_spatial_eval_step(
    stage: int,
    mesh: Mesh,
    axis: str = "data",
    w_axis: str | None = None,
    prev_stage: int | None = None,
    alpha: float = 1.0,
    dtype: Any = None,
):
    """Jitted native-resolution validation step (eval-mode BN, no update):
    ``step(variables, prev_variables, batch, pos_weight) -> metrics`` with
    the same metric dict as ``make_spatial_train_step``."""
    h_size = mesh.shape[axis]
    w_size = mesh.shape[w_axis] if w_axis else 1
    grid = _Grid(axis, h_size, w_axis, w_size)
    spec = P(None, axis, w_axis) if w_axis else P(None, axis)
    axes = (axis,) + ((w_axis,) if w_axis else ())
    use_unc = stage > 1 and prev_stage is not None
    unc_factor = 2 ** (stage - prev_stage) if use_unc else 1

    def local(variables, prev_variables, x, y, pos_weight):
        unc_map = (
            _spatial_unc_map(prev_stage, prev_variables, x, grid, dtype,
                             unc_factor)
            if use_unc else None
        )
        logits = _stage_forward(
            stage, variables["params"], variables["batch_stats"], x, grid, dtype
        )
        final, metrics = _spatial_loss_and_metrics(
            logits, y, pos_weight, unc_map, alpha, axes
        )
        return dict(metrics, final_loss=final)

    sharded = jax.shard_map(
        local, mesh=mesh, in_specs=(P(), P(), spec, spec, P()),
        out_specs=P(),
    )

    @jax.jit
    def step(variables, prev_variables, batch, pos_weight):
        x, y = batch
        _check_divisible(stage, x, h_size, w_size)
        return sharded(
            variables, prev_variables, jnp.asarray(x), jnp.asarray(y),
            jnp.asarray(pos_weight, jnp.float32),
        )

    return step

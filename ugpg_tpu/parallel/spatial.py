"""Spatially-sharded (halo-exchange) inference: whole-slide images over ICI.

NEW capability beyond the reference (SURVEY.md §2h lists SP as absent /
"only if scaling beyond single-chip images"): the reference downsizes every
MoNuSeg tile from 1000x1000 to <=256px before inference
(ref: MoNuSegImprove/test_monuseg.py:164-201), losing nuclei-scale detail.
This module runs a PGUNet stage on the FULL-resolution image by sharding the
height axis across a mesh axis and exchanging 1-row halos over ICI — the
TPU-native analog of context/sequence parallelism for a CNN (SURVEY §5
"spatial sharding with halo exchange via shard_map").

Why 1-row halos suffice everywhere:

* 3x3 convs need exactly one neighbor row (``ppermute`` of the boundary
  rows; shard 0 / shard S-1 receive zeros, which IS the conv zero-pad).
* 2x2/2 max-pool needs none (per-shard heights stay even).
* every resize in this network is bilinear align_corners=True — a TWO-TAP
  interpolation at any scale: output row ``o`` reads input rows
  ``floor(src)`` and ``floor(src)+1`` with ``src = o*(h_in-1)/(h_out-1)``.
  With both sides sharded evenly, output shard i's taps live in input shard
  i's rows +-1 — statically verified per call in ``_row_resize_matrix``.
* BatchNorm (eval mode) and heads are per-channel pointwise.

Everything is jit/shard_map — XLA schedules the ppermutes over ICI; no
hand-written collectives beyond the halo pattern itself.

Numerics match the unsharded ``PGUNetN.apply(..., train=False)`` to f32
round-off (the H-axis resize einsum is evaluated against an identical
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

__all__ = ["spatial_stage_infer", "make_spatial_infer", "spatial_predict"]


def _halo_rows(x: jax.Array, axis_name: str, size: int):
    """(top, bottom) 1-row halos from the H-axis neighbors.

    top[i] = last row of shard i-1; bottom[i] = first row of shard i+1.
    Boundary shards receive zeros (ppermute semantics) — exactly the conv
    zero-padding / zero-weight resize taps they need.
    """
    if size == 1:
        zero = jnp.zeros_like(x[:, :1])
        return zero, zero
    down = [(j, j + 1) for j in range(size - 1)]
    up = [(j + 1, j) for j in range(size - 1)]
    top = jax.lax.ppermute(x[:, -1:], axis_name, down)
    bottom = jax.lax.ppermute(x[:, :1], axis_name, up)
    return top, bottom


def _with_halo(x: jax.Array, axis_name: str, size: int) -> jax.Array:
    top, bottom = _halo_rows(x, axis_name, size)
    return jnp.concatenate([top, x, bottom], axis=1)


def _conv3x3_halo(x, kernel, bias, axis_name: str, size: int, dtype):
    """3x3 conv, stride 1, torch 'pad 1' semantics across shard boundaries."""
    xp = _with_halo(x, axis_name, size).astype(dtype)
    y = jax.lax.conv_general_dilated(
        xp,
        kernel.astype(dtype),
        window_strides=(1, 1),
        padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + bias.astype(dtype)


def _bn_eval(x, params, stats, dtype):
    """TorchBatchNorm eval path (running stats, f32 math)."""
    inv = jax.lax.rsqrt(stats["var"] + BN_EPS) * params["scale"]
    y = (x.astype(jnp.float32) - stats["mean"]) * inv + params["bias"]
    return y.astype(dtype)


def _double_conv(x, p, s, axis_name: str, size: int, dtype):
    x = _conv3x3_halo(x, p["conv1"]["kernel"], p["conv1"]["bias"], axis_name, size, dtype)
    x = jax.nn.relu(_bn_eval(x, p["bn1"], s["bn1"], dtype))
    x = _conv3x3_halo(x, p["conv2"]["kernel"], p["conv2"]["bias"], axis_name, size, dtype)
    return jax.nn.relu(_bn_eval(x, p["bn2"], s["bn2"], dtype))


def _max_pool2(x):
    from flax import linen as nn

    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


@functools.lru_cache(maxsize=None)
def _row_resize_matrix(h_in: int, h_out: int, shards: int) -> np.ndarray:
    """Halo-padded per-shard H-resize weights, statically tap-checked.

    Returns Wp of shape (h_out, h_in + 2) with Wp[:, 1:h_in+1] = the global
    align_corners=True matrix; shard i applies
    ``Wp[i*Lo:(i+1)*Lo, i*L : i*L + L + 2]`` to its halo-padded rows.
    Raises at trace time if any output row's taps leave the 1-row halo.
    """
    if h_in % shards or h_out % shards:
        raise ValueError(f"H {h_in}->{h_out} not divisible by {shards} shards")
    w = _bilinear_ac_matrix(h_in, h_out)  # (h_out, h_in)
    wp = np.zeros((h_out, h_in + 2), dtype=np.float32)
    wp[:, 1 : h_in + 1] = w
    lo, lo_out = h_in // shards, h_out // shards
    for i in range(shards):
        block = wp[i * lo_out : (i + 1) * lo_out]
        cols = np.nonzero(np.abs(block).sum(axis=0) > 0)[0]
        if cols.size and (cols.min() < i * lo or cols.max() >= i * lo + lo + 2):
            raise ValueError(
                f"resize {h_in}->{h_out}: shard {i} taps outside 1-row halo"
            )
    return wp


def _resize_halo(x, out_hw, axis_name: str, size: int):
    """Bilinear align_corners=True resize of H-sharded NHWC x (f32 math).

    H axis: per-shard slice of the halo-padded global interpolation matrix.
    W axis: unsharded, plain einsum (same matrices as ops/resize.py).
    """
    out_h, out_w = out_hw
    n, l, w, c = x.shape
    h = l * size
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if out_h != h:
        wp = jnp.asarray(_row_resize_matrix(h, out_h, size))
        i = jax.lax.axis_index(axis_name)
        lo_out = out_h // size
        wloc = jax.lax.dynamic_slice(wp, (i * lo_out, i * l), (lo_out, l + 2))
        yp = _with_halo(y, axis_name, size)
        y = jnp.einsum("ol,nlwc->nowc", wloc, yp,
                       precision=jax.lax.Precision.HIGHEST)
    if out_w != w:
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


def _stage_forward(stage: int, params, stats, x, axis_name: str, size: int, dtype):
    dc = lambda t, name: _double_conv(
        t, params[name]["conv"], stats[name]["conv"], axis_name, size, dtype
    )
    up2 = lambda t: _resize_halo(
        t, (t.shape[1] * size * 2, t.shape[2] * 2), axis_name, size
    )
    up_to = lambda o, res: _resize_halo(o, (res, res), axis_name, size)

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
        res = x5.shape[1] * size
        o1 = _head(x4, params["outc1"]["conv"])
        o2 = _head(x5, params["outc2"]["conv"])
        return up_to(o1, res) + o2
    if stage == 3:
        x1 = dc(x, "inc")
        x2 = dc(_max_pool2(x1), "down2")
        x3 = dc(_max_pool2(x2), "down3")
        x4 = dc(_max_pool2(x3), "down4")
        x5 = dc(jnp.concatenate([x3, up2(x4)], axis=-1), "up1")
        x6 = dc(jnp.concatenate([x2, up2(x5)], axis=-1), "up2")
        x7 = dc(jnp.concatenate([x1, up2(x6)], axis=-1), "up3")
        res = x7.shape[1] * size
        o = up_to(_head(x5, params["outc1"]["conv"]), res)
        o = o + up_to(_head(x6, params["outc2"]["conv"]), res)
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
        res = x9.shape[1] * size
        o = up_to(_head(x6, params["outc1"]["conv"]), res)
        o = o + up_to(_head(x7, params["outc2"]["conv"]), res)
        o = o + up_to(_head(x8, params["outc3"]["conv"]), res)
        return o + _head(x9, params["outc4"]["conv"])
    raise ValueError(f"stage must be 1..4, got {stage}")


def make_spatial_infer(stage: int, mesh: Mesh, axis: str = "data", dtype: Any = None):
    """Build a jitted H-sharded forward: (variables, x) -> logits.

    ``x`` is the full (N, H, W, C) image batch; H must be divisible by
    ``mesh.shape[axis] * 2**pools`` (pools: stage 1 -> 1, stage N -> N).
    Variables are replicated; activations are sharded on H; the returned
    logits are H-sharded f32 (N, H, W, K).  Eval-mode BatchNorm (running
    stats), matching ``PGUNetN.apply(..., train=False)``.
    """
    size = mesh.shape[axis]
    fwd = functools.partial(
        _stage_forward, stage, axis_name=axis, size=size, dtype=dtype
    )

    @jax.jit
    def infer(variables: Mapping[str, Any], x: jax.Array) -> jax.Array:
        pools = 1 if stage == 1 else stage
        if x.shape[1] % (size * 2**pools):
            raise ValueError(
                f"H={x.shape[1]} not divisible by shards*2^pools "
                f"({size}*{2**pools})"
            )
        sharded = jax.shard_map(
            lambda v, t: fwd(v["params"], v["batch_stats"], t),
            mesh=mesh,
            in_specs=(P(), P(None, axis)),
            out_specs=P(None, axis),
        )
        return sharded(variables, x)

    return infer


def spatial_stage_infer(
    variables, x, stage: int, mesh: Mesh, axis: str = "data", dtype: Any = None
) -> jax.Array:
    """One-shot convenience wrapper over ``make_spatial_infer``."""
    return make_spatial_infer(stage, mesh, axis, dtype)(variables, x)


def spatial_predict(
    variables, x, mesh: Mesh, stage: int = 4, axis: str = "data", dtype: Any = None
):
    """(preds, probs, uncertainty) for a whole-slide batch, H-sharded.

    Pointwise tail (sigmoid / threshold / 1-2|p-.5|) runs shard-local under
    the same jit; binary heads only.
    """
    from ugpg_tpu.uncertainty import binary_uncertainty

    logits = spatial_stage_infer(variables, x, stage, mesh, axis, dtype)
    probs = jax.nn.sigmoid(logits)
    preds = (probs > 0.5).astype(jnp.float32)
    return preds, probs, binary_uncertainty(probs)

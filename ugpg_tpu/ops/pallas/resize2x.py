"""Pallas TPU kernel: one-pass exact-2x bilinear upsample (align_corners=True).

STATUS — measured NEGATIVE result, kept as a documented experiment (correct,
tested in tests/test_resize.py, NOT wired into the models).

Motivation (flagship profile, BASELINE.md): the interpolation-matrix einsum
formulation of the Up-block upsample is itself fast, but XLA inserts layout
copies between the spatial-axis ``dot_general``s and the consuming convs —
at flagship shapes ~9.6 ms/step of pure data formatting (copy.11 alone:
2.15 GB at 393 GB/s).  This kernel computes both separable passes in VMEM
and touches HBM exactly twice: read the input block, write the output block.

Measured on v5e (flagship, batch 128): swapping this kernel into the four Up
blocks gave **752 img/s vs 1734 for the einsum path — 2.3x worse**.  Cause:
``pallas_call`` pins row-major ``{3,2,1,0}`` layouts on its operands/results
while XLA lays the surrounding convs out batch-minor (``{0,3,2,1}``, batch on
the 128-lane axis), so the graph re-inserts bigger relayout copies at the
kernel boundary than the ones the kernel removes — plus the in-kernel
stack/reshape row interleave lowers to sublane shuffles well below copy
bandwidth.  An XLA-level roll+lerp rewrite fared no better (971 img/s:
jnp.roll/stack lower to unfused concats).  Conclusion recorded in BASELINE.md:
the einsum resize with XLA's own copies is the measured winner; the network's
layout world belongs to the conv emitter and ops that fight it lose more at
the boundary than they save inside.

Math (see ops/resize.py:_lerp2x_weights): with scale s -> 2s under
align_corners=True, every output sample is a lerp of an *adjacent* input
pair —

* even rows  o=2k:   (k/(2s-1)) * x[k-1]     + (1 - k/(2s-1)) * x[k]
* odd  rows  o=2k+1: (1-(s-1-k)/(2s-1)) * x[k] + ((s-1-k)/(2s-1)) * x[k+1]

k=0 / k=s-1 give weight exactly 0 on the out-of-range tap, so edge
duplication in the padded scratch is value-neutral.  This matches
``resize_bilinear_align_corners(x, (2h, 2w))`` (torch ``F.interpolate``
semantics, ref: UG_unet_parts.py:70-81 usage) to f32 round-off.

Grid: (batch, row-strips).  The input image block is fetched once per batch
element (its index map is constant in the strip axis), mirrored into an
edge-padded VMEM scratch on the first strip, and each strip emits
(2*BH, 2W, C) of output.  All arithmetic is f32 on the VPU; no MXU, no
intermediate HBM round-trips.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ugpg_tpu.ops.resize import _lerp2x_weights

__all__ = ["upsample2x_pallas"]


def _kernel(elh_ref, ohh_ref, elw_ref, ohw_ref, x_ref, o_ref, xp_ref, *, h: int, w: int, bh: int):
    strip = pl.program_id(1)

    @pl.when(strip == 0)
    def _fill_padded():
        # xp[(1+i), (1+j)] = x[i, j]; edges duplicated (lerp weight 0 there).
        xp_ref[1 : h + 1, 1 : w + 1] = x_ref[0]
        xp_ref[0, 1 : w + 1] = x_ref[0, 0]
        xp_ref[h + 1, 1 : w + 1] = x_ref[0, h - 1]
        xp_ref[:, 0] = xp_ref[:, 1]
        xp_ref[:, w + 1] = xp_ref[:, w]

    ew = elw_ref[...].reshape(1, w, 1)
    ow = ohw_ref[...].reshape(1, w, 1)

    k0 = strip * bh
    s = xp_ref[pl.ds(k0, bh + 2)].astype(jnp.float32)  # rows k0-1 .. k0+bh (global)

    el = elh_ref[pl.ds(k0, bh)][:, :, None]  # (bh,1,1)
    oh = ohh_ref[pl.ds(k0, bh)][:, :, None]

    even = el * s[0:bh] + (1.0 - el) * s[1 : bh + 1]
    odd = (1.0 - oh) * s[1 : bh + 1] + oh * s[2 : bh + 2]
    z = jnp.stack([even, odd], axis=1).reshape(2 * bh, w + 2, s.shape[-1])

    even_w = ew * z[:, 0:w] + (1.0 - ew) * z[:, 1 : w + 1]
    odd_w = (1.0 - ow) * z[:, 1 : w + 1] + ow * z[:, 2 : w + 2]
    out = jnp.stack([even_w, odd_w], axis=2).reshape(2 * bh, 2 * w, s.shape[-1])
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnums=(1,))
def _upsample2x_pallas(x: jax.Array, bh: int) -> jax.Array:
    n, h, w, c = x.shape
    el_h, oh_h = _lerp2x_weights(h)
    el_w, oh_w = _lerp2x_weights(w)
    wvec = pl.BlockSpec(memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_kernel, h=h, w=w, bh=bh),
        out_shape=jax.ShapeDtypeStruct((n, 2 * h, 2 * w, c), x.dtype),
        grid=(n, h // bh),
        in_specs=[
            wvec,
            wvec,
            wvec,
            wvec,
            pl.BlockSpec(
                (1, h, w, c), lambda i, s: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 2 * bh, 2 * w, c), lambda i, s: (i, s, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((h + 2, w + 2, c), x.dtype)],
        # f32 strip temporaries push the big (128px, 64ch) planes past the
        # default 16 MB scoped-VMEM stack; v5e has 128 MB of VMEM
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=48 * 1024 * 1024),
    )(
        jnp.asarray(el_h)[:, None],
        jnp.asarray(oh_h)[:, None],
        jnp.asarray(el_w)[:, None],
        jnp.asarray(oh_w)[:, None],
        x,
    )


def upsample2x_pallas(x: jax.Array) -> jax.Array:
    """One-pass exact-2x align_corners=True bilinear upsample of NHWC ``x``.

    Forward-only building block (inference path); training routes through
    the einsum formulation whose transpose is pinned in ops/resize.py.
    """
    n, h, w, c = x.shape
    # strip height: keep the f32 strip temporaries a few MB under the 16 MB
    # scoped-VMEM stack limit (bh=16 at h=w=128, c=64 overflowed it by 360 KB)
    bh = h if h <= 8 else (16 if w * c <= 4096 else 8)
    if h % bh:
        raise ValueError(f"h={h} not divisible by strip height {bh}")
    return _upsample2x_pallas(x, bh)

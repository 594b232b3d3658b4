"""Fused DoubleConv Pallas kernel: conv3x3+bias+ReLU x2, mid kept in VMEM.

VERDICT r2 #4: at the flagship config (stage-4 256px, b128) the top two XLA
fusions are the inc/up4 DoubleConvs (5.0 + 7.5 ms/call) and each round-trips
its (N, 256, 256, 64) bf16 intermediate through HBM (~1 GB/dir at b128).
This kernel computes both convs of a (BN-folded) DoubleConv per H-tile with
the mid activation held in VMEM — HBM sees the input once and the output
once.

Design notes — Mosaic's alignment rules constrain every option here:

* memref (ref/DMA) slices must be 8-aligned on the sublane (second-minor)
  dim and 128-aligned on the lane dim; ``pltpu.roll`` rotates 32-bit data
  only.  In NHWC layout the H taps are free (rows are an untiled dim) but
  the W taps cannot be sliced; in a flattened (rows, W*C) layout the W
  taps become aligned lane slices but the rows land on the sublane dim
  and (a) DMA needs 8-row over-copied halos and (b) the dy taps need
  value-level slices — a variant that STALLS the Mosaic compiler at
  W=256 scale (never returned within 9 min; tile_h 8 and 16 both).
* This shipped variant therefore stays NHWC and handles W taps by
  shifting the f32 PARTIAL SUMS: the 9 taps are grouped by dx
  (``sum_dy dot(rows_dy, W[dy,dx])`` per dx — row slices are free), and
  each group's f32 partial is rolled +-1 column with the wrapped column
  masked — 2 rolls per conv instead of 6 (a per-tap-roll variant
  measured 1.9x slower than XLA from rotate traffic alone).
* Grid (N, H/TILE_H); the input stays in HBM (``memory_space=ANY``); each
  grid step DMAs its (TILE_H+4)-row halo window into a double-buffered
  VMEM scratch — the next tile's copy overlaps the current tile's compute
  (guide: Patterns / Double Buffering).  Out-of-image halo rows are
  zeroed in VMEM (the convs' H zero-padding); mid rows outside the image
  are re-zeroed before conv2 (conv2 pads with ZERO, not with
  conv1-of-zero-padding, which is nonzero after bias+ReLU).
* Each 3x3 conv is 9 (rows, W, C) x (C, Cout) MXU contractions
  accumulated in f32, bias+ReLU fused on the accumulator — identical math
  to XLA's bf16 conv path (which may keep excess precision on the mid, so
  bf16 outputs agree to bf16 rounding, not bitwise).

MEASURED RESULT (tools/ab_double_conv.py, v5e, b128, chained timing): the
per-tap-roll variant ran at 0.53x/0.60x of XLA on the up4/up3 shapes — the
fused HBM savings do not survive the VPU rotate traffic and the MXU's
underutilization at Cout=64, and XLA's conv implementation (which also
keeps the conv pair in registers across the fused bias+ReLU) is already
within ~2x of this workload's bandwidth bound.  Kept as a working,
correctness-tested kernel and a documented negative result (BASELINE.md),
not wired into the serving path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_double_conv"]


def _shift_w(p, dx: int, w: int):
    """Partial-sum tap shift: out[:, j, :] = p[:, j + dx - 1, :], zero
    outside [0, w).  ``shift(x) @ W == shift(x @ W)`` lets the roll run on
    the f32 partials (Mosaic rotates 32-bit data only)."""
    if dx == 1:
        return p
    # +1 for dx=0 (left pad), -1 == w-1 for dx=2 (pltpu.roll needs shift >= 0)
    shift = (1 - dx) % w
    r = pltpu.roll(p, shift, axis=1)
    col = jax.lax.broadcasted_iota(jnp.int32, p.shape, dimension=1)
    edge = 0 if dx == 0 else w - 1
    return jnp.where(col == edge, jnp.zeros_like(r), r)


def _conv3x3(rows_of, n_rows: int, w: int, w_ref, b_ref):
    """Σ_dx shift(Σ_dy rows_dy @ W[dy,dx]) + bias, ReLU — 2 rolls total."""
    cdim = (((2,), (0,)), ((), ()))  # contract channel axis of (r, w, c)
    acc = None
    for dx in range(3):
        part = None
        for dy in range(3):
            d = jax.lax.dot_general(
                rows_of(dy), w_ref[dy, dx], cdim,
                preferred_element_type=jnp.float32,
            )
            part = d if part is None else part + d
        s = _shift_w(part, dx, w)
        acc = s if acc is None else acc + s
    return jnp.maximum(acc + b_ref[:].astype(jnp.float32), 0.0)


def _dc_kernel(x_hbm, w1_ref, b1_ref, w2_ref, b2_ref, out_ref,
               xbuf, ybuf, sem, *, tile_h: int, h: int, w: int):
    """One (image, H-tile) grid step.

    xbuf: (2, tile_h + 4, w, cin)  double-buffered halo window
    ybuf: (tile_h + 2, w, cm)      conv1 output (mid), VMEM-resident
    """
    n = pl.program_id(0)
    t = pl.program_id(1)
    nt = pl.num_programs(1)
    r1 = tile_h + 2  # conv1 output rows needed by this tile's conv2

    def _dma(nn, tt, slot):
        """The (statically-shaped) halo-window copy for tile (nn, tt):
        boundary tiles copy fewer rows at a row offset; the missing halo
        rows are zero-filled separately.  The SAME descriptor must be used
        for start and wait (the DMA semaphore counts bytes)."""
        if nt == 1:
            return pltpu.make_async_copy(
                x_hbm.at[nn, pl.ds(0, tile_h)],
                xbuf.at[slot, pl.ds(2, tile_h)],
                sem.at[slot],
            )
        first = pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(0, tile_h + 2)],
            xbuf.at[slot, pl.ds(2, tile_h + 2)],
            sem.at[slot],
        )
        last = pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(tt * tile_h - 2, tile_h + 2)],
            xbuf.at[slot, pl.ds(0, tile_h + 2)],
            sem.at[slot],
        )
        if nt == 2:
            return first, last, None
        interior = pltpu.make_async_copy(
            x_hbm.at[nn, pl.ds(tt * tile_h - 2, tile_h + 4)],
            xbuf.at[slot, pl.ds(0, tile_h + 4)],
            sem.at[slot],
        )
        return first, last, interior

    def _dispatch(nn, tt, slot, op):
        if nt == 1:
            op(_dma(nn, tt, slot))
            return
        first, last, interior = _dma(nn, tt, slot)
        pl.when(tt == 0)(lambda: op(first))
        pl.when(tt == nt - 1)(lambda: op(last))
        if interior is not None:
            pl.when(jnp.logical_and(tt > 0, tt < nt - 1))(lambda: op(interior))

    def issue(nn, tt, slot):
        _dispatch(nn, tt, slot, lambda d: d.start())

    def wait(nn, tt, slot):
        _dispatch(nn, tt, slot, lambda d: d.wait())

    slot = t % 2

    @pl.when(jnp.logical_and(n == 0, t == 0))
    def _():
        issue(n, t, slot)

    # prefetch the next grid step's window into the other slot
    t_next = t + 1
    has_next = jnp.logical_or(t_next < nt, n + 1 < pl.num_programs(0))
    nn_next = jnp.where(t_next < nt, n, n + 1)
    tt_next = jnp.where(t_next < nt, t_next, 0)

    @pl.when(has_next)
    def _():
        issue(nn_next, tt_next, (t + 1) % 2)

    wait(n, t, slot)

    # zero the out-of-image halo rows for boundary tiles (the DMA does not
    # write them; conv zero-padding on H)
    @pl.when(t == 0)
    def _():
        xbuf[slot, 0] = jnp.zeros_like(xbuf[slot, 0])
        xbuf[slot, 1] = jnp.zeros_like(xbuf[slot, 1])

    @pl.when(t == nt - 1)
    def _():
        xbuf[slot, tile_h + 2] = jnp.zeros_like(xbuf[slot, tile_h + 2])
        xbuf[slot, tile_h + 3] = jnp.zeros_like(xbuf[slot, tile_h + 3])

    mid = _conv3x3(lambda dy: xbuf[slot, dy : dy + r1], r1, w, w1_ref, b1_ref)
    ybuf[:] = mid.astype(ybuf.dtype)

    # conv2 zero-pads ITS input: mid rows outside the image must be zero
    @pl.when(t == 0)
    def _():
        ybuf[0] = jnp.zeros_like(ybuf[0])

    @pl.when(t == nt - 1)
    def _():
        ybuf[tile_h + 1] = jnp.zeros_like(ybuf[tile_h + 1])

    out = _conv3x3(lambda dy: ybuf[dy : dy + tile_h], tile_h, w, w2_ref, b2_ref)
    out_ref[0] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def fused_double_conv(x, w1, b1, w2, b2, tile_h: int = 16,
                      interpret: bool = False):
    """(conv3x3 + bias + ReLU) x2 with the intermediate held in VMEM.

    ``x``: (N, H, W, Cin); weights HWIO; biases per-channel (BN pre-folded,
    models/folding.py).  Returns (N, H, W, Cout) in ``x.dtype``.  H must be
    divisible by ``tile_h``.  Matches the XLA path (conv-conv in x.dtype
    with f32 accumulation) to that path's own rounding.

    NOTE: measured SLOWER than XLA's fused convs at the flagship shapes —
    see the module docstring and BASELINE.md; provided as a documented
    experiment, not wired into serving.
    """
    n, h, w, cin = x.shape
    cm = w1.shape[-1]
    cout = w2.shape[-1]
    th = min(tile_h, h)
    if h % th:
        raise ValueError(f"H={h} not divisible by tile_h={th}")
    kernel = functools.partial(_dc_kernel, tile_h=th, h=h, w=w)
    flops = 2 * n * h * w * 9 * (cin * cm + cm * cout)
    return pl.pallas_call(
        kernel,
        grid=(n, h // th),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # x stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cout), lambda nn, tt: (nn, tt, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((n, h, w, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, w, cin), x.dtype),
            pltpu.VMEM((th + 2, w, cm), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=x.nbytes + n * h * w * cout * x.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(x, w1, b1, w2, b2)

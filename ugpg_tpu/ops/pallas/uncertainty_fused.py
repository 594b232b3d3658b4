"""Pallas TPU kernels for the uncertainty-guided loss hot path.

BASELINE.json designates the pointwise chain
``sigmoid -> |P-0.5| -> weight -> masked-mean`` as the Pallas fusion target.
Two kernels:

* ``uncertainty_from_logits``: logits -> A = 1 - 2*|sigmoid(x) - 0.5|,
  one VMEM pass (the uncertainty-map emission path of inference).
* ``uncertainty_weighted_bce``: the entire per-pixel loss reduction of the
  train step in ONE pass over HBM: stable BCE-with-logits(pos_weight) x
  uncertainty weight (1 + alpha*A), accumulating both the weighted and the
  unweighted sums on-chip (weighted for the gradient, unweighted for the
  monitoring ``base_loss``, ref: UG_unet.py:61-94).  A custom VJP re-derives
  the per-pixel gradient analytically in a second single pass
  (dx = g * w * ((1-z) - (1+(pw-1)z) * sigmoid(-x)) / N), so no per-pixel
  loss tensor is ever materialized in HBM — the XLA fallback keeps one
  (B,H,W,K) f32 intermediate alive between loss and grad.

Both kernels flatten inputs to (rows, 128) lanes and run a sequential grid
of (block_rows, 128) tiles with SMEM scalar accumulators; tails are masked
by flat-index comparison.  On non-TPU backends they run in interpreter mode
(CI parity tests on CPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["uncertainty_from_logits", "uncertainty_weighted_bce"]

_LANES = 128
_BLOCK_ROWS = 256  # (256, 128) f32 tile = 128 KiB <= VMEM budget


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_rows(n: int) -> int:
    rows = -(-n // _LANES)
    return -(-rows // _BLOCK_ROWS) * _BLOCK_ROWS


def _flatten_pad(x: jax.Array) -> jax.Array:
    n = x.size
    rows = _pad_rows(n)
    flat = jnp.zeros((rows * _LANES,), jnp.float32)
    return flat.at[:n].set(x.reshape(-1).astype(jnp.float32)).reshape(rows, _LANES)


# ---------------------------------------------------------------------------
# uncertainty map from logits (pointwise)
# ---------------------------------------------------------------------------

def _unc_kernel(x_ref, out_ref):
    probs = jax.nn.sigmoid(x_ref[:])
    out_ref[:] = 1.0 - 2.0 * jnp.abs(probs - 0.5)


def uncertainty_from_logits(logits: jax.Array) -> jax.Array:
    """A = 1 - 2*|sigmoid(logits) - 0.5| as a single fused VMEM pass."""
    shape = logits.shape
    x = _flatten_pad(logits)
    rows = x.shape[0]
    out = pl.pallas_call(
        _unc_kernel,
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        grid=(rows // _BLOCK_ROWS,),
        in_specs=[
            pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x)
    return out.reshape(-1)[: logits.size].reshape(shape).astype(logits.dtype)


# ---------------------------------------------------------------------------
# fused uncertainty-weighted BCE reduction (+ custom VJP)
# ---------------------------------------------------------------------------

def _loss_fwd_kernel(scal_ref, n_ref, x_ref, z_ref, p_ref, wsum_ref, bsum_ref):
    i = pl.program_id(0)
    pw = scal_ref[0]
    alpha = scal_ref[1]
    n_valid = n_ref[0]

    x = x_ref[:]
    z = z_ref[:]
    p = p_ref[:]
    sp = jax.nn.softplus(-x)
    pixel = (1.0 - z) * x + (1.0 + (pw - 1.0) * z) * sp
    weight = 1.0 + alpha * (1.0 - 2.0 * jnp.abs(p - 0.5))

    # mask the padded tail by global flat index, compared entirely in int32
    # (n_valid arrives via a dedicated int32 scalar prefetch: an f32 compare
    # is only exact for n <= 2^24 — the first silent mis-mask is at
    # n = 2^24 + 1, one element past the flagship batch-256 @ 256px config —
    # so any larger batch or multi-class run would drop valid boundary
    # elements from the loss and gradient).
    base = i * (_BLOCK_ROWS * _LANES)
    rows_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 0)
    lane_idx = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK_ROWS, _LANES), 1)
    flat_idx = base + rows_idx * _LANES + lane_idx
    valid = flat_idx < n_valid
    pixel = jnp.where(valid, pixel, 0.0)

    @pl.when(i == 0)
    def _():
        wsum_ref[0, 0] = 0.0
        bsum_ref[0, 0] = 0.0

    wsum_ref[0, 0] += jnp.sum(pixel * weight)
    bsum_ref[0, 0] += jnp.sum(pixel)


def _loss_bwd_kernel(scal_ref, x_ref, z_ref, p_ref, dx_ref):
    pw = scal_ref[0]
    alpha = scal_ref[1]
    g_over_n = scal_ref[2]

    x = x_ref[:]
    z = z_ref[:]
    p = p_ref[:]
    weight = 1.0 + alpha * (1.0 - 2.0 * jnp.abs(p - 0.5))
    # d pixel_loss / dx = (1 - z) - (1 + (pw-1)z) * sigmoid(-x)
    dpl = (1.0 - z) - (1.0 + (pw - 1.0) * z) * jax.nn.sigmoid(-x)
    dx_ref[:] = g_over_n * weight * dpl


def _run_fwd(x, z, p, pw, alpha):
    n = x.size
    xf = _flatten_pad(x)
    zf = _flatten_pad(z)
    pf = _flatten_pad(jnp.broadcast_to(p, x.shape))
    rows = xf.shape[0]
    scal = jnp.stack(
        [jnp.asarray(pw, jnp.float32).reshape(()),
         jnp.asarray(alpha, jnp.float32).reshape(())]
    )
    n_scal = jnp.asarray([n], jnp.int32)
    wsum, bsum = pl.pallas_call(
        _loss_fwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(rows // _BLOCK_ROWS,),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s, t: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s, t: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s, t: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        interpret=_interpret(),
    )(scal, n_scal, xf, zf, pf)
    n_f = jnp.float32(n)
    return wsum[0, 0] / n_f, bsum[0, 0] / n_f


def _run_bwd(x, z, p, pw, alpha, g):
    n = x.size
    xf = _flatten_pad(x)
    zf = _flatten_pad(z)
    pf = _flatten_pad(jnp.broadcast_to(p, x.shape))
    rows = xf.shape[0]
    scal = jnp.stack(
        [jnp.asarray(pw, jnp.float32).reshape(()),
         jnp.asarray(alpha, jnp.float32).reshape(()),
         (jnp.asarray(g, jnp.float32) / n).reshape(())]
    )
    dx = pl.pallas_call(
        _loss_bwd_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(rows // _BLOCK_ROWS,),
            in_specs=[
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s: (i, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((_BLOCK_ROWS, _LANES), lambda i, s: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((rows, _LANES), jnp.float32),
        interpret=_interpret(),
    )(scal, xf, zf, pf)
    return dx.reshape(-1)[: x.size].reshape(x.shape).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def uncertainty_weighted_bce(logits, targets, probs_prev, pos_weight, alpha):
    """(final_loss, base_loss) with final = mean(bce * (1 + alpha*A(p))).

    ``probs_prev`` are the already-upsampled previous-stage probabilities
    (stop-gradient, broadcastable to ``logits``); gradient flows to
    ``logits`` only, matching the reference's detached weights
    (ref: UG_unet.py:89).
    """
    return _run_fwd(logits, targets, probs_prev, pos_weight, alpha)


def _vjp_fwd(logits, targets, probs_prev, pos_weight, alpha):
    out = _run_fwd(logits, targets, probs_prev, pos_weight, alpha)
    return out, (logits, targets, probs_prev, pos_weight, alpha)


def _vjp_bwd(res, g):
    logits, targets, probs_prev, pos_weight, alpha = res
    g_final, _g_base = g  # base_loss is monitoring-only: no gradient
    dx = _run_bwd(logits, targets, probs_prev, pos_weight, alpha, g_final)
    return dx, None, None, None, None


uncertainty_weighted_bce.defvjp(_vjp_fwd, _vjp_bwd)

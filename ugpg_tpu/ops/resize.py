"""PyTorch-semantics image resizing as MXU-friendly matmuls.

The reference resizes with ``torch.nn.functional.interpolate`` everywhere:

* bilinear, ``align_corners=True`` for images / logits / probability maps
  (ref: UG_unet.py:36-57, UG_unet.py:221,257-258,300-302,419-424,
  uncertainty_guided_trainer.py:208,281,499)
* ``nearest`` for segmentation masks
  (ref: uncertainty_guided_trainer.py:209,282,500)

``jax.image.resize`` implements neither convention, so we build the exact
two-tap separable interpolation as small dense matrices (one per spatial
axis) applied via ``einsum``: both contractions tile onto the MXU and the
matrices are trace-time constants.

This formulation is the measured winner on v5e (see
``_resize_bilinear_fwd``): a layout-preserving two-tap gather+lerp variant
ran 41% slower (constant-index spatial gathers are scalar-bound on TPU),
even though the einsums cost some XLA layout copies around the
spatial-axis ``dot_general``s (~9 ms/step at flagship shapes; recorded in
BASELINE.md).

The backward is pinned via ``jax.custom_vjp`` to the exact-transpose
einsum matmuls, so no future forward rewrite can accidentally hand
autodiff a formulation whose transpose is a colliding scatter-add (which
TPUs handle poorly).

All public functions take NHWC arrays (TPU-native layout).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "resize_bilinear_align_corners",
    "resize_bilinear_align_corners_nhw",
    "resize_nearest",
    "upsample2x_bilinear_align_corners",
]


@functools.lru_cache(maxsize=None)
def _bilinear_ac_matrix(in_size: int, out_size: int) -> np.ndarray:
    """Interpolation matrix W (out_size, in_size) for align_corners=True.

    Row i holds the two-tap bilinear weights of output sample i:
    ``src = i * (in-1) / (out-1)`` (0 when out_size == 1, matching torch's
    area_pixel_compute_scale guard).
    """
    w = np.zeros((out_size, in_size), dtype=np.float64)
    if out_size == 1 or in_size == 1:
        w[:, 0] = 1.0
        return w.astype(np.float32)
    src = np.arange(out_size, dtype=np.float64) * (in_size - 1) / (out_size - 1)
    lo = np.clip(np.floor(src).astype(np.int64), 0, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    frac = src - lo
    rows = np.arange(out_size)
    np.add.at(w, (rows, lo), 1.0 - frac)
    np.add.at(w, (rows, hi), frac)
    return w.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _nearest_indices(in_size: int, out_size: int) -> np.ndarray:
    """Source indices for torch's legacy ``mode='nearest'``: floor(i*in/out)."""
    scale = in_size / out_size
    idx = np.floor(np.arange(out_size, dtype=np.float64) * scale).astype(np.int64)
    return np.clip(idx, 0, in_size - 1)


def _resize_bilinear_fwd(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Separable interpolation-matrix einsums (MXU).

    Measured on v5e (flagship, batch 128): this formulation sustains 1742
    img/s vs 1024 img/s for a two-tap gather+lerp variant — constant-index
    gathers along spatial axes lower poorly on TPU, while the einsums tile
    onto the MXU (at the cost of some layout copies XLA inserts around the
    spatial-axis dot_generals).
    """
    out_h, out_w = size
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    if dtype == jnp.bfloat16:
        # bf16 fast path: MXU multiplies bf16 x bf16 with f32 accumulation
        # natively; keeping operands bf16 halves the HBM traffic.  The
        # two-tap weights lose ~3 decimal digits in bf16 — fine for model
        # activations, NOT used for the parity-critical f32 path.
        wh = jnp.asarray(_bilinear_ac_matrix(h, out_h)).astype(dtype)
        ww = jnp.asarray(_bilinear_ac_matrix(w, out_w)).astype(dtype)
        y = x
        if out_h != h:
            y = jnp.einsum("oh,nhwc->nowc", wh, y,
                           preferred_element_type=jnp.float32)
        if out_w != w:
            y = jnp.einsum("pw,nhwc->nhpc", ww, y.astype(dtype),
                           preferred_element_type=jnp.float32)
        return y.astype(dtype)
    wh = jnp.asarray(_bilinear_ac_matrix(h, out_h))
    ww = jnp.asarray(_bilinear_ac_matrix(w, out_w))
    y = x.astype(jnp.float32)
    if out_h != h:
        y = jnp.einsum("oh,nhwc->nowc", wh, y, precision=jax.lax.Precision.HIGHEST)
    if out_w != w:
        y = jnp.einsum("pw,nhwc->nhpc", ww, y, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _resize_core(x, size: tuple[int, int], in_hw: tuple[int, int], dtype_name: str):
    return _resize_bilinear_fwd(x, size)


def _resize_vjp_fwd(x, size, in_hw, dtype_name):
    return _resize_bilinear_fwd(x, size), None


def _resize_vjp_bwd(size, in_hw, dtype_name, _res, g):
    h, w = in_hw
    out_h, out_w = size
    if (h, w) == (out_h, out_w):
        return (g.astype(dtype_name),)
    y = g.astype(jnp.float32)
    # transpose of the forward's linear map: W^T per resized axis
    if out_h != h:
        wh = jnp.asarray(_bilinear_ac_matrix(h, out_h))
        y = jnp.einsum("oh,nowc->nhwc", wh, y,
                       precision=jax.lax.Precision.HIGHEST)
    if out_w != w:
        ww = jnp.asarray(_bilinear_ac_matrix(w, out_w))
        y = jnp.einsum("pw,nhpc->nhwc", ww, y,
                       precision=jax.lax.Precision.HIGHEST)
    return (y.astype(dtype_name),)


_resize_core.defvjp(_resize_vjp_fwd, _resize_vjp_bwd)


def resize_bilinear_align_corners(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear resize of NHWC ``x`` to (H', W'), torch align_corners=True.

    Forward: separable interpolation-matrix einsums (MXU).
    Backward: exact-transpose einsum matmuls — see module docstring.
    """
    return _resize_core(
        x, tuple(size), (x.shape[1], x.shape[2]), jnp.dtype(x.dtype).name
    )


def resize_nearest(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Nearest resize of NHWC ``x`` to (H', W'), torch legacy 'nearest' mode."""
    out_h, out_w = size
    n, h, w, c = x.shape
    if (h, w) == (out_h, out_w):
        return x
    if out_h != h:
        x = jnp.take(x, jnp.asarray(_nearest_indices(h, out_h)), axis=1)
    if out_w != w:
        x = jnp.take(x, jnp.asarray(_nearest_indices(w, out_w)), axis=2)
    return x


def resize_bilinear_align_corners_nhw(x: jax.Array, size: tuple[int, int]) -> jax.Array:
    """Bilinear align_corners=True resize of a channel-squeezed (N, H, W) map.

    Single-class logit/probability maps stored as (N, H, W, 1) get
    degenerate T(1,128) tilings (the size-1 channel dim lands on the
    128-lane axis); keeping them squeezed as (N, H, W) gives W the lane
    dimension and makes the W-axis contraction a native minor-dim matmul.
    Same interpolation matrices as the NHWC path; f32 math.
    """
    out_h, out_w = size
    n, h, w = x.shape
    if (h, w) == (out_h, out_w):
        return x
    dtype = x.dtype
    y = x.astype(jnp.float32)
    if out_h != h:
        wh = jnp.asarray(_bilinear_ac_matrix(h, out_h))
        y = jnp.einsum("oh,nhw->now", wh, y, precision=jax.lax.Precision.HIGHEST)
    if out_w != w:
        ww = jnp.asarray(_bilinear_ac_matrix(w, out_w))
        # contraction over the minor dim: (n*h, w) @ (w, p) — native matmul
        y = jnp.einsum("nhw,wp->nhp", y, ww.T, precision=jax.lax.Precision.HIGHEST)
    return y.astype(dtype)


@functools.lru_cache(maxsize=None)
def _lerp2x_weights(size: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row lerp weights of the exact-2x align_corners=True upsample.

    With scale h -> 2h the source position of output row o is
    ``o * (h-1) / (2h-1)``, which lands in adjacent-row pairs:

    * even rows o=2k:  taps (k-1, k), weight on k-1 is  k/(2h-1)
    * odd  rows o=2k+1: taps (k, k+1), weight on k+1 is (h-1-k)/(2h-1)

    (k=0 / k=h-1 boundary cases give weight 0 on the out-of-range tap, so a
    circular roll supplies the neighbor harmlessly.)
    """
    k = np.arange(size, dtype=np.float64)
    even_lo = (k / (2 * size - 1)).astype(np.float32)
    odd_hi = ((size - 1 - k) / (2 * size - 1)).astype(np.float32)
    return even_lo, odd_hi


def upsample2x_bilinear_align_corners(x: jax.Array) -> jax.Array:
    """2x bilinear upsample (align_corners=True), used by every Up block.

    Dispatch note (measured on v5e, flagship batch 128): an XLA-level
    roll+lerp+interleave rewrite of this op ran 44% WORSE than the einsum
    formulation (971 vs 1734 img/s — jnp.roll/stack lower to unfused
    concats that materialize every intermediate), so exact-2x keeps the
    same einsum path as the general resize.  See ops/pallas/resize2x.py
    for the one-pass Pallas kernel used on the TPU inference path.
    """
    n, h, w, c = x.shape
    return resize_bilinear_align_corners(x, (2 * h, 2 * w))

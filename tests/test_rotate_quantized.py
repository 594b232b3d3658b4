"""Angle-quantized rotation (ops/rotate.py): per-angle equivalence with the
exact inverse-affine warp, and the distributional contract of the
quantized sampler (VERDICT r4 weak #3 A/B formulation)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.data.augment import _rotation_matrix, affine_sample
from ugpg_tpu.ops.rotate import (
    angle_grid,
    random_rotate_quantized,
    rotate_fixed,
    rotate_fixed_gather,
)


def _ref_rotate(x, angle, mode):
    m = _rotation_matrix(jnp.float32(angle))
    return jax.vmap(lambda im: affine_sample(im, m, mode))(x)


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 99.0 if mse == 0 else 10.0 * np.log10(1.0 / mse)


@pytest.mark.parametrize("size", [31, 32])
def test_rot90_multiples_exact(size):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, size, size, 3), np.float32))
    for ang in (-90.0, 90.0, 180.0):
        got = rotate_fixed(x, ang)
        want = _ref_rotate(x, ang, "bilinear")
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   atol=1e-5, err_msg=f"angle {ang}")


def _smooth_batch(b, size, seed):
    """Band-limited test images: interpolation-order differences are tiny
    on smooth content, so geometry errors (wrong shear math) dominate any
    PSNR drop; white noise would instead measure the interpolators' own
    high-frequency response difference."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    imgs = np.empty((b, size, size, 3), np.float32)
    for i in range(b):
        f = rng.uniform(1.0, 3.0, 6)
        p = rng.uniform(0, 2 * np.pi, 3)
        for c in range(3):
            imgs[i, :, :, c] = 0.5 + 0.45 * np.sin(
                2 * np.pi * (f[2 * c] * xx + f[2 * c + 1] * yy) + p[c]
            )
    return jnp.asarray(imgs)


@pytest.mark.parametrize("angle", [-77.0, -30.0, -7.5, 13.0, 45.0, 61.0])
def test_shear_rotation_matches_warp(angle):
    """Three-shear vs direct bilinear warp: same geometry, interpolation
    differs only in factorization order — high PSNR on smooth content,
    near-exact zero fill outside the rotated frame."""
    x = _smooth_batch(2, 33, seed=1)
    got = np.asarray(rotate_fixed(x, angle))
    want = np.asarray(_ref_rotate(x, angle, "bilinear"))
    assert got.shape == want.shape
    assert _psnr(got, want) > 30.0, f"angle {angle}: PSNR {_psnr(got, want)}"
    # zero-fill agreement: pixels the exact warp zero-fills stay (near) zero
    outside = want == 0.0
    assert float(np.abs(got[outside]).max(initial=0.0)) < 0.3


@pytest.mark.parametrize("angle", [-60.0, 20.0, 90.0])
def test_shear_rotation_nearest_masks(angle):
    """Nearest-mode (mask) rotation: binary stays binary and the rotated
    mask overlaps the exact nearest warp to high IoU."""
    yy, xx = np.mgrid[0:41, 0:41]
    m = ((yy - 20) ** 2 + (xx - 20) ** 2 < 12 ** 2).astype(np.float32)
    m = jnp.asarray(m[None, :, :, None])
    got = np.asarray(rotate_fixed(m, angle, nearest=True))
    want = np.asarray(_ref_rotate(m, angle, "nearest"))
    assert set(np.unique(got)) <= {0.0, 1.0}
    inter = float(np.sum((got > 0.5) & (want > 0.5)))
    union = float(np.sum((got > 0.5) | (want > 0.5)))
    assert inter / union > 0.95, f"angle {angle}: IoU {inter / union}"


def test_gather_variant_matches_warp_exactly():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.random((2, 32, 32, 3), np.float32))
    for ang in (-50.0, 15.0):
        np.testing.assert_allclose(
            np.asarray(rotate_fixed_gather(x, ang)),
            np.asarray(_ref_rotate(x, ang, "bilinear")), atol=1e-6,
        )


def test_quantized_sampler_distribution_and_selection():
    """Each sample gets exactly one grid angle; the empirical angle
    distribution is uniform over the grid (mean ~0, full support)."""
    grid = angle_grid(90.0, 5)
    assert grid == [-90.0, -45.0, 0.0, 45.0, 90.0]

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.random((64, 17, 17, 1), np.float32))
    key = jax.random.key(0)
    out = np.asarray(random_rotate_quantized(key, x, max_deg=90.0, n_angles=5))
    # every sample equals ONE of the 5 bucket rotations
    per_angle = [np.asarray(rotate_fixed(x, a)) for a in grid]
    hits = np.zeros(5, int)
    for b in range(x.shape[0]):
        match = [np.allclose(out[b], pa[b], atol=1e-5) for pa in per_angle]
        assert sum(match) >= 1, f"sample {b} matches no bucket"
        hits[int(np.argmax(match))] += 1
    # uniform-ish: all buckets hit on 64 draws of 5 buckets
    assert (hits > 0).all(), hits


def test_quantized_masks_joint():
    """Image and mask of a sample rotate by the SAME bucket angle."""
    yy, xx = np.mgrid[0:21, 0:21]
    m = ((yy - 10) ** 2 + (xx - 10) ** 2 < 6 ** 2).astype(np.float32)
    masks = jnp.asarray(np.tile(m[None, :, :, None], (8, 1, 1, 1)))
    imgs = masks * 0.8 + 0.1
    key = jax.random.key(1)
    oi, om = random_rotate_quantized(key, imgs, masks, max_deg=90.0,
                                     n_angles=7)
    # the mask must track the image content: high overlap of thresholded
    # image foreground and rotated mask per sample
    oi, om = np.asarray(oi), np.asarray(om)
    for b in range(8):
        fg = oi[b, :, :, 0] > 0.5
        mk = om[b, :, :, 0] > 0.5
        inter = np.sum(fg & mk)
        union = max(np.sum(fg | mk), 1)
        assert inter / union > 0.9

"""Resize ops must match torch.nn.functional.interpolate exactly.

This is SURVEY.md §7 hard-part #1: every input/logit/probability resize in
the reference uses bilinear align_corners=True, and masks use 'nearest'.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from ugpg_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
    upsample2x_bilinear_align_corners,
)

SIZES = [(32, 64), (64, 32), (32, 256), (256, 32), (17, 40), (40, 17), (1, 8), (7, 7)]


@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_bilinear_align_corners_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, in_size, in_size, 3), dtype=np.float32)
    got = np.asarray(
        resize_bilinear_align_corners(jnp.asarray(x), (out_size, out_size))
    )
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(out_size, out_size),
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-5)


def test_bilinear_rectangular(rng):
    x = rng.standard_normal((1, 30, 50, 2), dtype=np.float32)
    got = np.asarray(resize_bilinear_align_corners(jnp.asarray(x), (45, 20)))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(45, 20),
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-5)


@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_nearest_matches_torch(rng, in_size, out_size):
    x = rng.standard_normal((2, in_size, in_size, 1), dtype=np.float32)
    got = np.asarray(resize_nearest(jnp.asarray(x), (out_size, out_size)))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=(out_size, out_size),
            mode="nearest",
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_array_equal(got, want)


def test_nearest_preserves_binary_masks(rng):
    mask = (rng.random((2, 64, 64, 1)) > 0.5).astype(np.float32)
    out = np.asarray(resize_nearest(jnp.asarray(mask), (32, 32)))
    assert set(np.unique(out)).issubset({0.0, 1.0})


def test_upsample2x_matches_scale_factor(rng):
    x = rng.standard_normal((2, 16, 16, 4), dtype=np.float32)
    got = np.asarray(upsample2x_bilinear_align_corners(jnp.asarray(x)))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            scale_factor=2,
            mode="bilinear",
            align_corners=True,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=5e-5)


def test_identity_resize_is_noop(rng):
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 3), dtype=np.float32))
    assert resize_bilinear_align_corners(x, (8, 8)) is x
    assert resize_nearest(x, (8, 8)) is x

"""Resize ops must match torch.nn.functional.interpolate exactly.

This is SURVEY.md §7 hard-part #1: every input/logit/probability resize in
the reference uses bilinear align_corners=True, and masks use 'nearest'.
"""

import functools

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


def test_nhw_resize_matches_nhwc(rng):
    """Channel-squeezed (N,H,W) resize == NHWC resize on the same data."""
    from ugpg_tpu.ops.resize import resize_bilinear_align_corners_nhw

    for in_size, out_size in [(32, 256), (64, 256), (17, 40), (8, 8)]:
        x = rng.standard_normal((2, in_size, in_size), dtype=np.float32)
        got = np.asarray(
            resize_bilinear_align_corners_nhw(jnp.asarray(x), (out_size, out_size))
        )
        want = np.asarray(
            resize_bilinear_align_corners(
                jnp.asarray(x)[..., None], (out_size, out_size)
            )
        )[..., 0]
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_pallas_resize2x_interpret_matches_einsum(rng):
    """One-pass Pallas 2x upsample (interpret mode on CPU) == einsum path.

    The kernel is a documented standalone experiment: correct and one-pass,
    but measured 2.3x SLOWER end-to-end at flagship shapes (752 vs 1734
    img/s) because pallas_call pins row-major operand layouts while the
    surrounding convs run batch-minor — see ops/pallas/resize2x.py.
    """
    from unittest import mock

    from ugpg_tpu.ops.pallas import resize2x

    with mock.patch.object(resize2x.pl, "pallas_call", functools.partial(
        resize2x.pl.pallas_call.__wrapped__
        if hasattr(resize2x.pl.pallas_call, "__wrapped__")
        else resize2x.pl.pallas_call,
        interpret=True,
    )):
        for h, c in [(8, 16), (16, 8), (32, 4)]:
            x = jnp.asarray(rng.standard_normal((2, h, h, c)), jnp.float32)
            got = np.asarray(resize2x.upsample2x_pallas(x))
            want = np.asarray(resize_bilinear_align_corners(x, (2 * h, 2 * h)))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

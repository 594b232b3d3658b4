"""On-device augmentation tests: joint consistency, distributions, color math.

torchvision is not in the image, so color/geometry semantics are checked
against analytic expectations (the formulas torchvision documents) rather
than against torchvision outputs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ugpg_tpu.data.augment import (
    IMAGENET_MEAN,
    IMAGENET_STD,
    _GRAY,
    _hsv_to_rgb,
    _rgb_to_hsv,
    _rotation_matrix,
    affine_sample,
    augment_herlev_batch,
    augment_monuseg_batch,
    color_jitter,
    imagenet_normalize,
    random_affine,
    random_flips,
    random_rotate,
)


def _batch(rng, b=8, s=32):
    imgs = rng.random((b, s, s, 3)).astype(np.float32)
    masks = (rng.random((b, s, s, 1)) > 0.5).astype(np.float32)
    return jnp.asarray(imgs), jnp.asarray(masks)


def test_flips_joint_consistency(rng):
    imgs, masks = _batch(rng)
    fi, fm = random_flips(jax.random.key(0), imgs, masks)
    # flip is a permutation: content preserved exactly
    np.testing.assert_allclose(
        np.sort(np.asarray(fi).ravel()), np.sort(np.asarray(imgs).ravel()), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(fm).sum(), np.asarray(masks).sum())
    # image and mask receive the SAME flip pattern: re-derive it from the
    # image and check it explains the mask too.
    fi_np, fm_np = np.asarray(fi), np.asarray(fm)
    for i in range(imgs.shape[0]):
        src = np.asarray(imgs[i])
        msk = np.asarray(masks[i])
        candidates = {
            (False, False): (src, msk),
            (True, False): (src[:, ::-1], msk[:, ::-1]),
            (False, True): (src[::-1], msk[::-1]),
            (True, True): (src[::-1, ::-1], msk[::-1, ::-1]),
        }
        matched = [
            k for k, (ci, cm) in candidates.items()
            if np.allclose(ci, fi_np[i]) and np.allclose(cm, fm_np[i])
        ]
        assert matched, f"sample {i}: image/mask flip patterns disagree"


def test_flips_probability(rng):
    imgs, masks = _batch(rng, b=200, s=8)
    fi, _ = random_flips(jax.random.key(1), imgs, masks)
    changed = np.any(np.asarray(fi) != np.asarray(imgs), axis=(1, 2, 3))
    assert 0.6 < changed.mean() < 0.9  # P(identity) = .25


def test_rotate_preserves_mask_binarity(rng):
    imgs, masks = _batch(rng)
    ri, rm = random_rotate(jax.random.key(2), imgs, masks, max_deg=90)
    assert set(np.unique(np.asarray(rm))).issubset({0.0, 1.0})
    assert ri.shape == imgs.shape and rm.shape == masks.shape


def test_rotate_zero_angle_identity(rng):
    imgs, _ = _batch(rng, b=2)
    out = random_rotate(jax.random.key(3), imgs, max_deg=1e-7)
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)


def test_rotation_90_is_exact_rot90(rng):
    """90-degree rotation lands exactly on grid points: must equal np.rot90."""
    img = rng.random((17, 17, 3)).astype(np.float32)
    got = np.asarray(affine_sample(jnp.asarray(img), _rotation_matrix(jnp.float32(90.0))))
    r_ccw = np.rot90(img, 1)
    r_cw = np.rot90(img, -1)
    assert np.allclose(got, r_ccw, atol=1e-5) or np.allclose(got, r_cw, atol=1e-5)


def test_rotation_content_bounded(rng):
    imgs, _ = _batch(rng, b=4, s=16)
    out = random_rotate(jax.random.key(10), imgs, max_deg=45)
    o = np.asarray(out)
    assert o.min() >= 0.0 and o.max() <= 1.0 + 1e-6


def test_color_jitter_saturation_zero_is_gray():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((1, 8, 8, 3)).astype(np.float32))
    gray = jnp.einsum("nhwc,c->nhw", x, _GRAY)[..., None]
    # saturation factor 0 -> pure grayscale (torchvision semantics)
    y = (1 - 0.0) * gray + 0.0 * x
    assert np.allclose(np.asarray(y[..., 0]), np.asarray(y[..., 1]))


def test_hue_roundtrip(rng):
    x = jnp.asarray(rng.random((4, 8, 8, 3)).astype(np.float32))
    h, s, v = _rgb_to_hsv(x)
    back = _hsv_to_rgb(h, s, v)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_hsv_known_values():
    # pure red -> h=0, s=1, v=1
    red = jnp.asarray([[[[1.0, 0.0, 0.0]]]])
    h, s, v = _rgb_to_hsv(red)
    assert float(h[0, 0, 0]) == 0.0 and float(s[0, 0, 0]) == 1.0
    # half-hue shift of red -> cyan
    cyan = _hsv_to_rgb((h + 0.5) % 1.0, s, v)
    np.testing.assert_allclose(np.asarray(cyan[0, 0, 0]), [0.0, 1.0, 1.0], atol=1e-6)


def test_color_jitter_range_and_prob(rng):
    imgs, _ = _batch(rng, b=64, s=8)
    out = color_jitter(jax.random.key(4), imgs, prob=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(imgs))
    out = color_jitter(jax.random.key(5), imgs, prob=1.0)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0
    assert not np.allclose(np.asarray(out), np.asarray(imgs))


def test_random_affine_shapes_and_identity(rng):
    imgs, _ = _batch(rng, b=4, s=16)
    out = random_affine(
        jax.random.key(6), imgs, max_deg=0.0, translate=0.0, scale_range=(1.0, 1.0)
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(imgs), atol=1e-4)
    out2 = random_affine(jax.random.key(7), imgs, translate=0.1, scale_range=(0.9, 1.1))
    assert out2.shape == imgs.shape


def test_monuseg_pipeline_shapes(rng):
    imgs, masks = _batch(rng, b=4, s=32)
    ai, am = augment_monuseg_batch(jax.random.key(6), imgs, masks)
    assert ai.shape == imgs.shape and am.shape == masks.shape
    assert set(np.unique(np.asarray(am))).issubset({0.0, 1.0})
    assert 0.0 <= float(ai.min()) and float(ai.max()) <= 1.0


def test_herlev_pipeline_and_normalize(rng):
    imgs, _ = _batch(rng, b=4, s=32)
    out = augment_herlev_batch(jax.random.key(7), imgs)
    assert out.shape == imgs.shape
    normed = np.asarray(imagenet_normalize(out))
    want = (np.asarray(out) - np.asarray(IMAGENET_MEAN)) / np.asarray(IMAGENET_STD)
    np.testing.assert_allclose(normed, want, atol=1e-6)


def test_augment_is_deterministic_per_key(rng):
    imgs, masks = _batch(rng, b=2, s=16)
    a1 = augment_monuseg_batch(jax.random.key(8), imgs, masks)
    a2 = augment_monuseg_batch(jax.random.key(8), imgs, masks)
    np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
    b1 = augment_monuseg_batch(jax.random.key(9), imgs, masks)
    assert not np.allclose(np.asarray(a1[0]), np.asarray(b1[0]))

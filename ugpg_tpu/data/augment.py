"""On-device augmentation: batched, jit-able, `jax.random`-keyed.

The reference augments per-sample on the host with PIL/torchvision
(MoNuSeg joint transforms: shared-seed hflip/vflip p=.5, rotation
U(-90°, 90°), color jitter p=.8 with brightness/contrast/saturation ±0.2,
hue ±0.05 — ref: monuseg_dataset.py:137-187; Herlev stack: flips, rotation
±15°, ColorJitter(.2,.2,.2,.1), RandomAffine(translate .1, scale .9-1.1) —
ref: herlev_dataset.py:200-228).

TPU-first re-design: augmentation runs as one fused XLA program on the
accelerator, whole batch at a time, with per-sample randomness from split
keys.  Geometric ops are a single inverse-affine bilinear/nearest gather;
color ops follow torchvision's adjust_* math so the *distributions* match
the reference (exact RNG streams can't — SURVEY §7 hard-part #6).
Masks always sample with nearest + zero fill; images bilinear + zero fill,
mirroring PIL.rotate semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

__all__ = [
    "affine_sample",
    "random_flips",
    "random_rotate",
    "random_affine",
    "color_jitter",
    "augment_monuseg_batch",
    "augment_herlev_batch",
]


# ---------------------------------------------------------------------------
# geometric: one inverse-affine gather
# ---------------------------------------------------------------------------

def _sample_bilinear(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    """Bilinear sample of (H, W, C) at float coords; zero outside."""
    h, w, _ = img.shape
    y0 = jnp.floor(ys)
    x0 = jnp.floor(xs)
    wy = ys - y0
    wx = xs - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    top = tap(y0, x0) * (1 - wx)[..., None] + tap(y0, x0 + 1) * wx[..., None]
    bot = tap(y0 + 1, x0) * (1 - wx)[..., None] + tap(y0 + 1, x0 + 1) * wx[..., None]
    return top * (1 - wy)[..., None] + bot * wy[..., None]


def _sample_nearest(img: jax.Array, ys: jax.Array, xs: jax.Array) -> jax.Array:
    h, w, _ = img.shape
    yi = jnp.round(ys).astype(jnp.int32)
    xi = jnp.round(xs).astype(jnp.int32)
    valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
    v = img[jnp.clip(yi, 0, h - 1), jnp.clip(xi, 0, w - 1)]
    return jnp.where(valid[..., None], v, 0.0)


def affine_sample(
    img: jax.Array, matrix: jax.Array, mode: str = "bilinear"
) -> jax.Array:
    """Warp one (H, W, C) image by the *inverse* affine ``matrix`` (2x3):
    source = M @ [x_out, y_out, 1], coordinates centered at the image
    center (PIL convention)."""
    h, w, _ = img.shape
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = jnp.mgrid[0:h, 0:w]
    x_c = xx - cx
    y_c = yy - cy
    xs = matrix[0, 0] * x_c + matrix[0, 1] * y_c + matrix[0, 2] + cx
    ys = matrix[1, 0] * x_c + matrix[1, 1] * y_c + matrix[1, 2] + cy
    if mode == "nearest":
        return _sample_nearest(img, ys, xs)
    return _sample_bilinear(img, ys, xs)


def _rotation_matrix(angle_deg: jax.Array) -> jax.Array:
    """Inverse rotation matrix for a CCW rotation of the image content."""
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    return jnp.array([[c, -s, 0.0], [s, c, 0.0]])


def _affine_matrix(angle_deg, translate_xy, scale) -> jax.Array:
    """Inverse matrix of rotate(angle) + scale + translate (torchvision
    RandomAffine composition), mapping output coords -> source coords."""
    rad = jnp.deg2rad(angle_deg)
    c, s = jnp.cos(rad), jnp.sin(rad)
    inv_scale = 1.0 / scale
    # inverse of [scale*R | t] is [R^-1/scale | -R^-1 t/scale]
    m00 = c * inv_scale
    m01 = -s * inv_scale
    m10 = s * inv_scale
    m11 = c * inv_scale
    tx, ty = translate_xy[0], translate_xy[1]
    return jnp.array(
        [[m00, m01, -(m00 * tx + m01 * ty)], [m10, m11, -(m10 * tx + m11 * ty)]]
    )


# ---------------------------------------------------------------------------
# batched augmentations
# ---------------------------------------------------------------------------

def random_flips(key, images, masks=None):
    """Per-sample hflip p=.5 then vflip p=.5, joint on image+mask."""
    b = images.shape[0]
    kh, kv = jax.random.split(key)
    do_h = jax.random.bernoulli(kh, 0.5, (b,))
    do_v = jax.random.bernoulli(kv, 0.5, (b,))

    def flip(x):
        x = jnp.where(do_h[:, None, None, None], x[:, :, ::-1, :], x)
        return jnp.where(do_v[:, None, None, None], x[:, ::-1, :, :], x)

    if masks is None:
        return flip(images)
    return flip(images), flip(masks)


def random_rotate(key, images, masks=None, max_deg: float = 90.0):
    """Per-sample rotation U(-max_deg, max_deg); bilinear/nearest, zero fill."""
    b = images.shape[0]
    angles = jax.random.uniform(key, (b,), minval=-max_deg, maxval=max_deg)
    mats = jax.vmap(_rotation_matrix)(angles)
    rot_img = jax.vmap(lambda im, m: affine_sample(im, m, "bilinear"))(images, mats)
    if masks is None:
        return rot_img
    rot_mask = jax.vmap(lambda im, m: affine_sample(im, m, "nearest"))(masks, mats)
    return rot_img, rot_mask


def random_affine(key, images, max_deg=0.0, translate=0.1, scale_range=(0.9, 1.1)):
    """torchvision RandomAffine(degrees, translate, scale) equivalent."""
    b, h, w, _ = images.shape
    ka, kt, ks = jax.random.split(key, 3)
    angles = jax.random.uniform(ka, (b,), minval=-max_deg, maxval=max_deg)
    t = jax.random.uniform(
        kt, (b, 2), minval=-translate, maxval=translate
    ) * jnp.array([w, h])
    scales = jax.random.uniform(ks, (b,), minval=scale_range[0], maxval=scale_range[1])
    mats = jax.vmap(_affine_matrix)(angles, t, scales)
    return jax.vmap(lambda im, m: affine_sample(im, m, "bilinear"))(images, mats)


# -- color ------------------------------------------------------------------

_GRAY = jnp.array([0.299, 0.587, 0.114])


def _rgb_to_hsv(rgb):
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    mx = jnp.max(rgb, axis=-1)
    mn = jnp.min(rgb, axis=-1)
    diff = mx - mn
    safe = jnp.where(diff == 0, 1.0, diff)
    rc = (mx - r) / safe
    gc = (mx - g) / safe
    bc = (mx - b) / safe
    h = jnp.where(
        mx == r, bc - gc, jnp.where(mx == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(diff == 0, 0.0, (h / 6.0) % 1.0)
    s = jnp.where(mx == 0, 0.0, diff / jnp.where(mx == 0, 1.0, mx))
    return h, s, mx


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def color_jitter(
    key,
    images,
    brightness: float = 0.2,
    contrast: float = 0.2,
    saturation: float = 0.2,
    hue: float = 0.05,
    prob: float = 1.0,
):
    """torchvision adjust_brightness/contrast/saturation/hue chain with
    per-sample factors; applied with probability ``prob`` per sample."""
    b = images.shape[0]
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    bf = 1.0 + jax.random.uniform(kb, (b, 1, 1, 1), minval=-brightness, maxval=brightness)
    cf = 1.0 + jax.random.uniform(kc, (b, 1, 1, 1), minval=-contrast, maxval=contrast)
    sf = 1.0 + jax.random.uniform(ks, (b, 1, 1, 1), minval=-saturation, maxval=saturation)
    hf = jax.random.uniform(kh, (b, 1, 1), minval=-hue, maxval=hue)

    x = images * bf  # brightness
    gray = jnp.einsum("nhwc,c->nhw", x, _GRAY)[..., None]
    x = (1.0 - cf) * gray.mean(axis=(1, 2, 3), keepdims=True) + cf * x  # contrast
    x = (1.0 - sf) * gray + sf * x  # saturation (re-uses pre-sat gray, torch order)
    x = jnp.clip(x, 0.0, 1.0)
    h, s, v = _rgb_to_hsv(x)
    x = _hsv_to_rgb((h + hf) % 1.0, s, v)  # hue
    x = jnp.clip(x, 0.0, 1.0)

    if prob >= 1.0:
        return x
    apply = jax.random.bernoulli(kp, prob, (b,))
    return jnp.where(apply[:, None, None, None], x, images)


# -- full pipelines ----------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("max_deg", "quantize_angles"))
def augment_monuseg_batch(key, images, masks, max_deg: float = 90.0,
                          quantize_angles: int = 0):
    """Joint MoNuSeg train augmentation (ref: monuseg_dataset.py:145-181):
    hflip p.5, vflip p.5, rotation U(-90, 90), color jitter p.8.

    ``quantize_angles=N`` (opt-in) replaces the continuous per-sample
    rotation gather with the angle-quantized MXU shear path
    (ops/rotate.py): N discrete angles, constant-index programs — same
    flip/color chain and key layout, different angle marginal (discrete
    uniform)."""
    k1, k2, k3 = jax.random.split(key, 3)
    images, masks = random_flips(k1, images, masks)
    if quantize_angles:
        from ugpg_tpu.ops.rotate import random_rotate_quantized

        images, masks = random_rotate_quantized(
            k2, images, masks, max_deg=max_deg, n_angles=quantize_angles
        )
    else:
        images, masks = random_rotate(k2, images, masks, max_deg=max_deg)
    images = color_jitter(k3, images, 0.2, 0.2, 0.2, 0.05, prob=0.8)
    return images, masks


@jax.jit
def augment_herlev_batch(key, images):
    """Herlev train augmentation (ref: herlev_dataset.py:208-215):
    flips, rotation ±15°, ColorJitter(.2,.2,.2,.1), affine(translate .1,
    scale .9-1.1).  Runs on un-normalized [0,1] RGB; normalization follows."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    images = random_flips(k1, images)
    images = random_rotate(k2, images, max_deg=15.0)
    images = color_jitter(k3, images, 0.2, 0.2, 0.2, 0.1, prob=1.0)
    images = random_affine(k4, images, translate=0.1, scale_range=(0.9, 1.1))
    return images


IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def imagenet_normalize(images: jax.Array) -> jax.Array:
    """ImageNet normalization (ref: herlev_dataset.py:221-226)."""
    return (images - IMAGENET_MEAN) / IMAGENET_STD

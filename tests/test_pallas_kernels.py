"""Pallas fused-kernel parity vs the XLA reference path (interpret mode on
CPU; the same kernels compile for real on TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.ops.losses import bce_with_logits
from ugpg_tpu.ops.pallas.uncertainty_fused import (
    uncertainty_from_logits,
    uncertainty_weighted_bce,
)
from ugpg_tpu.uncertainty import apply_uncertainty_weighted_loss, binary_uncertainty


def _data(rng, shape=(4, 32, 32, 1)):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32) * 3)
    z = jnp.asarray((rng.random(shape) > 0.6).astype(np.float32))
    p = jnp.asarray(rng.random(shape).astype(np.float32))
    return x, z, p


def test_uncertainty_from_logits_matches_xla(rng):
    x, _, _ = _data(rng)
    got = np.asarray(uncertainty_from_logits(x))
    want = np.asarray(binary_uncertainty(jax.nn.sigmoid(x)))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_uncertainty_from_logits_odd_sizes(rng):
    # shapes that do not tile evenly into (256, 128) blocks
    for shape in [(1, 7, 13, 1), (3, 33, 65, 2)]:
        x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
        got = np.asarray(uncertainty_from_logits(x))
        want = np.asarray(binary_uncertainty(jax.nn.sigmoid(x)))
        np.testing.assert_allclose(got, want, atol=1e-6)


def test_fused_loss_matches_xla(rng):
    x, z, p = _data(rng)
    pw, alpha = 5.0, 1.0
    final, base = uncertainty_weighted_bce(x, z, p, pw, alpha)

    pixel = bce_with_logits(x, z, pw)
    amap = binary_uncertainty(p)
    want_final, want_base = apply_uncertainty_weighted_loss(pixel, amap, alpha)
    np.testing.assert_allclose(float(final), float(want_final), rtol=1e-5)
    np.testing.assert_allclose(float(base), float(want_base), rtol=1e-5)


def test_fused_loss_odd_size_masking(rng):
    x, z, p = _data(rng, shape=(2, 17, 19, 1))  # 1292 elements, heavy padding
    final, base = uncertainty_weighted_bce(x, z, p, 5.0, 2.0)
    pixel = bce_with_logits(x, z, 5.0)
    want_final, want_base = apply_uncertainty_weighted_loss(
        pixel, binary_uncertainty(p), 2.0
    )
    np.testing.assert_allclose(float(final), float(want_final), rtol=1e-5)
    np.testing.assert_allclose(float(base), float(want_base), rtol=1e-5)


@pytest.mark.slow
def test_fused_loss_int32_mask_beyond_2pow24(rng):
    """Regression: n = 2^24 + 8.  f32 cannot represent odd integers above
    2^24, so the old f32 flat-index compare (idx < f32(n)) mis-masked
    boundary elements for any n > 2^24 (f32(2^24+1) rounds DOWN to 2^24,
    silently dropping valid elements from loss and gradient) — one element
    past the flagship batch-256 @ 256px config.  The int32 compare must be
    exact at any size."""
    n = (1 << 24) + 8
    shape = (8, 2097153, 1, 1)  # 8 * (2^21 + 1) = 2^24 + 8
    assert int(np.prod(shape)) == n
    rs = np.random.default_rng(7)
    x = rs.standard_normal(shape).astype(np.float32)
    z = (rs.random(shape) > 0.6).astype(np.float32)
    p = rs.random(shape).astype(np.float32)
    pw, alpha = 5.0, 1.0

    final, base = uncertainty_weighted_bce(
        jnp.asarray(x), jnp.asarray(z), jnp.asarray(p), pw, alpha
    )

    # numpy reference (f64 accumulate)
    sp = np.logaddexp(0.0, -x.astype(np.float64))
    pixel = (1.0 - z) * x.astype(np.float64) + (1.0 + (pw - 1.0) * z) * sp
    weight = 1.0 + alpha * (1.0 - 2.0 * np.abs(p.astype(np.float64) - 0.5))
    want_final = float(np.mean(pixel * weight))
    want_base = float(np.mean(pixel))
    np.testing.assert_allclose(float(final), want_final, rtol=1e-4)
    np.testing.assert_allclose(float(base), want_base, rtol=1e-4)

    # the last flat element must be included: zeroing it changes the sum
    x2 = x.copy()
    x2[-1, -1, -1, -1] = 50.0  # large logit => near-zero pixel loss at z=1
    z2 = z.copy()
    z2[-1, -1, -1, -1] = 1.0
    final2, _ = uncertainty_weighted_bce(
        jnp.asarray(x2), jnp.asarray(z2), jnp.asarray(p), pw, alpha
    )
    sp2 = np.logaddexp(0.0, -x2.astype(np.float64))
    pixel2 = (1.0 - z2) * x2.astype(np.float64) + (1.0 + (pw - 1.0) * z2) * sp2
    want2 = float(np.mean(pixel2 * weight))
    np.testing.assert_allclose(float(final2), want2, rtol=1e-4)


def test_fused_loss_gradient_matches_xla(rng):
    x, z, p = _data(rng)
    pw, alpha = 5.0, 1.0

    def fused(xx):
        return uncertainty_weighted_bce(xx, z, p, pw, alpha)[0]

    def ref(xx):
        pixel = bce_with_logits(xx, z, pw)
        return apply_uncertainty_weighted_loss(pixel, binary_uncertainty(p), alpha)[0]

    g_fused = jax.grad(fused)(x)
    g_ref = jax.grad(ref)(x)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_ref),
                               rtol=1e-4, atol=1e-7)


def test_fused_loss_under_jit(rng):
    x, z, p = _data(rng, shape=(2, 16, 16, 1))

    @jax.jit
    def f(xx):
        return uncertainty_weighted_bce(xx, z, p, 5.0, 1.0)

    final, base = f(x)
    assert np.isfinite(float(final)) and float(final) >= float(base) * 0.99


def test_fused_train_step_matches_xla_step(rng):
    """make_seg_train_step(fused_loss=True) must match the XLA path."""
    import optax

    from ugpg_tpu.data.synthetic import disk_dataset
    from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    m1 = PGUNet1(num_classes=1)
    m2 = PGUNet2(num_classes=1)
    v1 = m1.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    v2 = m2.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)), False)
    tx = torch_rmsprop(1e-4)
    images, masks = disk_dataset(num_samples=4, image_size=64, seed=11)
    batch = (jnp.asarray(images), jnp.asarray(masks))
    pw = jnp.asarray(5.0)
    key = jax.random.key(3)

    results = {}
    for fused in (False, True):
        step = make_seg_train_step(
            m2, tx, 2, 64, prev_module=m1, prev_resolution=32,
            donate=False, fused_loss=fused,
        )
        state = TrainState.create(v2, tx)
        new_state, m = step(state, v1, batch, pw, key)
        results[fused] = (m, new_state)

    mf, sf = results[True]
    mx, sx = results[False]
    np.testing.assert_allclose(
        float(mf["final_loss"]), float(mx["final_loss"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(mf["base_loss"]), float(mx["base_loss"]), rtol=1e-5
    )
    a = np.asarray(sf.params["inc"]["conv"]["conv1"]["kernel"])
    b = np.asarray(sx.params["inc"]["conv"]["conv1"]["kernel"])
    assert np.mean(np.abs(a - b)) < 1e-4  # RMSprop sign noise tolerance


def test_fused_stage1_plain_mean(rng):
    """fused_loss stage-1 path (alpha=0, p=0.5) equals the plain mean."""
    from ugpg_tpu.models.pgunet import PGUNet1
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    m = PGUNet1(num_classes=1)
    v = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    tx = torch_rmsprop(3e-4)
    x = jnp.asarray(rng.random((2, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray((rng.random((2, 32, 32, 1)) > 0.5).astype(np.float32))
    pw = jnp.asarray(5.0)
    outs = []
    for fused in (False, True):
        step = make_seg_train_step(m, tx, 1, 32, donate=False, fused_loss=fused)
        _, metrics = step(TrainState.create(v, tx), {}, (x, y), pw, jax.random.key(0))
        outs.append(float(metrics["final_loss"]))
    np.testing.assert_allclose(outs[0], outs[1], rtol=1e-5)


# ---------------------------------------------------------------------------
# Fused DoubleConv kernel (ops/pallas/double_conv.py) — a documented
# negative result perf-wise (BASELINE.md round 3), but the kernel must stay
# CORRECT: conv3x3+bias+ReLU x2 with zero padding, all tile positions.


def _xla_double_conv(x, w1, b1, w2, b2):
    dn = ("NHWC", "HWIO", "NHWC")
    y = jax.lax.conv_general_dilated(
        x, w1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    mid = jnp.maximum(y + b1, 0)
    y2 = jax.lax.conv_general_dilated(
        mid, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
    return jnp.maximum(y2 + b2, 0)


def test_fused_double_conv_matches_xla_all_tilings(rng):
    from ugpg_tpu.ops.pallas.double_conv import fused_double_conv

    # single-tile / first-last / interior tile cases
    for n, h, w, cin, cm, cout, th in (
        (1, 8, 16, 3, 4, 4, 8),       # nt == 1
        (2, 16, 16, 5, 8, 6, 8),      # nt == 2 (first/last only)
        (2, 32, 16, 8, 8, 8, 8),      # interior tiles
        (1, 48, 24, 4, 6, 5, 16),     # rectangular, non-128 channels
    ):
        x = jnp.asarray(rng.standard_normal((n, h, w, cin)), jnp.float32)
        w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cm)) * 0.1, jnp.float32)
        b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.1, jnp.float32)
        w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cout)) * 0.1, jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((cout,)) * 0.1, jnp.float32)
        got = fused_double_conv(x, w1, b1, w2, b2, tile_h=th, interpret=True)
        want = _xla_double_conv(x, w1, b1, w2, b2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


def test_fused_double_conv_rejects_bad_tiling(rng):
    from ugpg_tpu.ops.pallas.double_conv import fused_double_conv

    x = jnp.zeros((1, 24, 16, 4))
    w1 = jnp.zeros((3, 3, 4, 4))
    b = jnp.zeros((4,))
    w2 = jnp.zeros((3, 3, 4, 4))
    with pytest.raises(ValueError, match="divisible"):
        fused_double_conv(x, w1, b, w2, b, tile_h=16, interpret=True)

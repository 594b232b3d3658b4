"""Weight-transfer overlap semantics (SURVEY.md §2d, hard-part #3)."""

import numpy as np

import jax
import jax.numpy as jnp

from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2, PGUNet3, PGUNet4
from ugpg_tpu.progressive.transfer import flatten_tree, transfer_weights


def _init(model, res):
    return model.init(jax.random.key(0), jnp.zeros((1, res, res, 3)), False)


def test_exact_shape_copy():
    prev = {"params": {"a": {"kernel": jnp.ones((3, 3, 4, 8))}}}
    cur = {"params": {"a": {"kernel": jnp.zeros((3, 3, 4, 8))}}}
    new, copied = transfer_weights(prev, cur)
    assert copied == ["params/a/kernel"]
    np.testing.assert_array_equal(np.asarray(new["params"]["a"]["kernel"]), 1.0)


def test_conv_overlap_slab():
    prev = {"params": {"c": {"kernel": jnp.ones((3, 3, 4, 8))}}}
    cur = {"params": {"c": {"kernel": jnp.zeros((3, 3, 6, 10))}}}
    new, copied = transfer_weights(prev, cur)
    k = np.asarray(new["params"]["c"]["kernel"])
    assert k[:, :, :4, :8].min() == 1.0
    assert k[:, :, 4:, :].max() == 0.0 and k[:, :, :, 8:].max() == 0.0


def test_dense_and_1d_overlap():
    prev = {"params": {"d": {"kernel": jnp.ones((8, 4)), "bias": jnp.ones((4,))}}}
    cur = {"params": {"d": {"kernel": jnp.zeros((10, 6)), "bias": jnp.zeros((6,))}}}
    new, copied = transfer_weights(prev, cur)
    k = np.asarray(new["params"]["d"]["kernel"])
    b = np.asarray(new["params"]["d"]["bias"])
    assert k[:8, :4].min() == 1.0 and k[8:, :].max() == 0.0 and k[:, 4:].max() == 0.0
    assert b[:4].min() == 1.0 and b[4:].max() == 0.0


def test_missing_keys_left_at_init():
    prev = {"params": {"only_prev": {"kernel": jnp.ones((2, 2))}}}
    cur = {"params": {"only_cur": {"kernel": jnp.full((2, 2), 7.0)}}}
    new, copied = transfer_weights(prev, cur)
    assert copied == []
    np.testing.assert_array_equal(np.asarray(new["params"]["only_cur"]["kernel"]), 7.0)


def test_stage1_to_stage2_shared_blocks_carry_over():
    v1 = _init(PGUNet1(num_classes=1), 32)
    v2 = _init(PGUNet2(num_classes=1), 64)
    new, copied = transfer_weights(v1, v2)

    # down4 in stage1 is (512->512); in stage2 also (512->512): exact copy.
    p1 = v1["params"]["down4"]["conv"]["conv1"]["kernel"]
    p2 = new["params"]["down4"]["conv"]["conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))

    # up1 (1024->256) identical shape across stages: exact copy.
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["up1"]["conv"]["conv2"]["kernel"]),
        np.asarray(new["params"]["up1"]["conv"]["conv2"]["kernel"]),
    )

    # inc differs (3->512 vs 3->256): overlap slab on out-channels.
    inc1 = np.asarray(v1["params"]["inc"]["conv"]["conv1"]["kernel"])  # (3,3,3,512)
    inc2 = np.asarray(new["params"]["inc"]["conv"]["conv1"]["kernel"])  # (3,3,3,256)
    np.testing.assert_array_equal(inc1[:, :, :, :256], inc2)

    # BN running stats transfer too.
    np.testing.assert_array_equal(
        np.asarray(v1["batch_stats"]["down4"]["conv"]["bn1"]["mean"]),
        np.asarray(new["batch_stats"]["down4"]["conv"]["bn1"]["mean"]),
    )

    # stage2-only blocks (down3, up2, outc2) keep their fresh init.
    np.testing.assert_array_equal(
        np.asarray(v2["params"]["up2"]["conv"]["conv1"]["kernel"]),
        np.asarray(new["params"]["up2"]["conv"]["conv1"]["kernel"]),
    )


def test_all_adjacent_stage_transfers_copy_many_keys():
    models = {1: PGUNet1, 2: PGUNet2, 3: PGUNet3, 4: PGUNet4}
    res = {1: 32, 2: 64, 3: 128, 4: 256}
    prev = _init(models[1](num_classes=1), res[1])
    for s in (2, 3, 4):
        cur = _init(models[s](num_classes=1), res[s])
        new, copied = transfer_weights(prev, cur)
        # every shared-name leaf should be handled (params + batch_stats)
        shared = set(flatten_tree(prev)) & set(flatten_tree(cur))
        assert len(copied) == len(shared)
        assert len(copied) >= 36
        prev = new


def test_facade_transfer_api():
    from ugpg_tpu.models.progressive import ProgressiveUNet

    m = ProgressiveUNet(in_channels=3, out_channels=1)
    v1 = m.init(jax.random.key(0), stage=1)
    v2 = m.init(jax.random.key(1), stage=2)
    merged = m.transfer_weights(v1, v2, stage=2, verbose=False)
    np.testing.assert_array_equal(
        np.asarray(v1["params"]["down4"]["conv"]["conv1"]["kernel"]),
        np.asarray(merged["params"]["down4"]["conv"]["conv1"]["kernel"]),
    )

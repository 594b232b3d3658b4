"""Shape/param-count golden tests for all PGUNet stages and the facade."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import (
    PGUNet1,
    PGUNet2,
    PGUNet3,
    PGUNet4,
    STAGE_RESOLUTIONS,
    UNet,
)
from ugpg_tpu.models.progressive import ProgressiveUNet

STAGES = {1: PGUNet1, 2: PGUNet2, 3: PGUNet3, 4: PGUNet4}


def _n_params(tree):
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(tree))


@pytest.mark.parametrize("stage", [1, 2, 3, 4])
def test_stage_output_shapes(stage):
    res = STAGE_RESOLUTIONS[stage]
    model = STAGES[stage](num_classes=1)
    x = jnp.zeros((2, res, res, 3))
    variables = model.init(jax.random.key(0), x, False)
    y = model.apply(variables, x, False)
    assert y.shape == (2, res, res, 1)


@pytest.mark.parametrize("stage", [1, 2])
def test_stage_multiclass_output(stage):
    res = STAGE_RESOLUTIONS[stage]
    model = STAGES[stage](num_classes=3)
    x = jnp.zeros((1, res, res, 3))
    variables = model.init(jax.random.key(0), x, False)
    assert model.apply(variables, x, False).shape == (1, res, res, 3)


def test_param_counts_match_reference_architecture():
    """Parameter counts derived from the reference topology (UG_unet.py:178-304).

    Computed analytically: conv k*k*cin*cout + cout, BN 2*cout (+2 stats).
    """
    def conv(cin, cout, k=3):
        return k * k * cin * cout + cout

    def dc(cin, cout):  # DoubleConv params (weights+bias+BN scale/bias)
        return conv(cin, cout) + 2 * cout + conv(cout, cout) + 2 * cout

    # PGUNet1: inc(3,512) down4(512,512) up1(1024,256) outc(256,1)
    want1 = dc(3, 512) + dc(512, 512) + dc(1024, 256) + conv(256, 1, 1)
    model = PGUNet1(num_classes=1)
    v = model.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    assert _n_params(v["params"]) == want1

    # PGUNet2: inc(3,256) down3(256,512) down4(512,512) up1(1024,256)
    #          up2(512,128) outc1(256,1) outc2(128,1)
    want2 = (
        dc(3, 256) + dc(256, 512) + dc(512, 512) + dc(1024, 256) + dc(512, 128)
        + conv(256, 1, 1) + conv(128, 1, 1)
    )
    model = PGUNet2(num_classes=1)
    v = model.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), False)
    assert _n_params(v["params"]) == want2


def test_batch_stats_update_in_train_mode(rng):
    model = PGUNet1(num_classes=1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, False)
    y, mutated = model.apply(variables, x, True, mutable=["batch_stats"])
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(mutated["batch_stats"])
    assert any(not np.allclose(b, a) for b, a in zip(before, after))


def test_eval_mode_is_deterministic(rng):
    model = PGUNet1(num_classes=1)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    variables = model.init(jax.random.key(0), x, False)
    y1 = model.apply(variables, x, False)
    y2 = model.apply(variables, x, False)
    np.testing.assert_array_equal(np.asarray(y1), np.asarray(y2))


def test_legacy_unet_shape():
    model = UNet(num_classes=2)
    x = jnp.zeros((1, 32, 32, 3))
    v = model.init(jax.random.key(0), x, False)
    assert model.apply(v, x, False).shape == (1, 32, 32, 2)


def test_progressive_facade_resizes_input():
    model = ProgressiveUNet(in_channels=3, out_channels=1, stage=1)
    v = model.init(jax.random.key(0))
    # feed 256px input; facade must resize to 32px before stage 1
    y = model.apply(v, jnp.zeros((1, 256, 256, 3)))
    assert y.shape == (1, 32, 32, 1)
    assert model.get_current_resolution() == 32
    model.set_stage(3)
    assert model.get_current_resolution() == 128


def test_progressive_facade_readme_kwargs():
    m = ProgressiveUNet(in_channels=3, out_channels=2, stage=2)
    assert m.num_classes == 2 and m.current_stage == 2
    with pytest.raises(ValueError):
        m.set_stage(5)
    with pytest.raises(ValueError):
        ProgressiveUNet(task_type="detection")


@pytest.mark.parametrize("stage", [1, 2, 3, 4])
def test_classifier_shapes(stage):
    from ugpg_tpu.models.classifier import CLS_STAGE_RESOLUTIONS

    res = CLS_STAGE_RESOLUTIONS[stage]
    model = HerlevClassificationModel(stage=stage, num_classes=7)
    x = jnp.zeros((2, res, res, 3))
    v = model.init(jax.random.key(0), x, False)
    y = model.apply(v, x, False)
    assert y.shape == (2, 7)
    # encoder always ends at a 512-channel map -> fc1 kernel is (512, 512)
    assert v["params"]["fc1"]["kernel"].shape == (512, 512)


def test_classifier_dropout_needs_rng(rng):
    model = HerlevClassificationModel(stage=1, num_classes=7)
    x = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    v = model.init(jax.random.key(0), x, False)
    y1, _ = model.apply(
        v, x, True, rngs={"dropout": jax.random.key(1)}, mutable=["batch_stats"]
    )
    y2, _ = model.apply(
        v, x, True, rngs={"dropout": jax.random.key(2)}, mutable=["batch_stats"]
    )
    assert not np.allclose(np.asarray(y1), np.asarray(y2))


def test_classification_facade():
    m = ProgressiveUNet(in_channels=3, num_classes=7, stage=4, task_type="classification")
    assert m.get_current_resolution() == 224  # 224, not 256 (ref train_herlev.py:138)
    m.set_stage(1)
    v = m.init(jax.random.key(0))
    y = m.apply(v, jnp.zeros((2, 224, 224, 3)))
    assert y.shape == (2, 7)


def test_torch_batchnorm_running_stats_match_torch():
    """TorchBatchNorm must track torch's running stats exactly: normalize by
    biased batch var, store the unbiased (n/(n-1)) estimate in running_var."""
    import torch

    from ugpg_tpu.models.blocks import TorchBatchNorm

    g = np.random.default_rng(5)
    feats = 6
    tbn = torch.nn.BatchNorm2d(feats, eps=1e-5, momentum=0.1)
    tbn.weight.data = torch.from_numpy(
        (1 + 0.2 * g.standard_normal(feats)).astype(np.float32))
    tbn.bias.data = torch.from_numpy(
        (0.1 * g.standard_normal(feats)).astype(np.float32))

    mod = TorchBatchNorm()
    variables = mod.init(jax.random.key(0), jnp.zeros((2, 5, 7, feats)), False)
    variables = {
        "params": {"scale": jnp.asarray(tbn.weight.detach().numpy()),
                    "bias": jnp.asarray(tbn.bias.detach().numpy())},
        "batch_stats": variables["batch_stats"],
    }

    tbn.train()
    bs = variables["batch_stats"]
    for i in range(4):
        x = g.standard_normal((2, 5, 7, feats)).astype(np.float32) * (1 + i)
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)
        want = tbn(xt).permute(0, 2, 3, 1).detach().numpy()
        got, mut = mod.apply(
            {"params": variables["params"], "batch_stats": bs},
            jnp.asarray(x), False, mutable=["batch_stats"],
        )
        bs = mut["batch_stats"]
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

    np.testing.assert_allclose(
        np.asarray(bs["mean"]), tbn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(bs["var"]), tbn.running_var.numpy(), rtol=1e-5, atol=1e-6)

    # eval mode uses the running stats identically
    tbn.eval()
    x = g.standard_normal((2, 5, 7, feats)).astype(np.float32)
    want = tbn(torch.from_numpy(x).permute(0, 3, 1, 2)).permute(0, 2, 3, 1).detach().numpy()
    got = mod.apply({"params": variables["params"], "batch_stats": bs},
                    jnp.asarray(x), True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)

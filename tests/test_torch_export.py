"""Torch checkpoint EXPORT (ours -> reference .pth): inverse name/layout
mapping round trips, strict ``load_state_dict`` compatibility with the real
reference modules, and forward parity on the exported weights."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.io.torch_export import (
    convert_variables_to_state_dict,
    export_torch_checkpoint,
    full_classifier_state_dict,
)
from ugpg_tpu.io.torch_import import convert_torch_state_dict
from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import PGUNet1, PGUNet2
from ugpg_tpu.progressive.transfer import flatten_tree, unflatten_tree


def _randomize_batch_stats(variables, seed=0):
    """Non-trivial running stats so the export path is actually exercised
    (fresh init is all zeros-mean/ones-var)."""
    g = np.random.default_rng(seed)
    out = {}
    for path, v in flatten_tree(variables).items():
        v = np.asarray(v)
        if path[0] == "batch_stats":
            if path[-1] == "mean":
                v = 0.1 * g.standard_normal(v.shape).astype(np.float32)
            else:
                v = (1.0 + 0.2 * g.random(v.shape)).astype(np.float32)
        out[path] = v
    return unflatten_tree(out)


def _reference_models():
    from tools.parity_eval import reference_available

    if not reference_available():
        pytest.skip("reference checkout not mounted")
    from tools.parity_vs_reference import _import_reference

    _import_reference()
    import train_herlev as ref_cls  # noqa: E402
    import UG_unet as ref_unet  # noqa: E402

    return ref_unet, ref_cls


def test_seg_roundtrip_exact():
    module = PGUNet2(num_classes=1)
    variables = _randomize_batch_stats(
        module.init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)), False), 1
    )
    sd, skipped = convert_variables_to_state_dict(variables)
    assert skipped == []
    # every BN module carries the buffer torch's strict loading requires
    bn_keys = [k for k in sd if k.endswith("num_batches_tracked")]
    assert len(bn_keys) == 2 * 5  # 5 DoubleConvs (inc/down3/down4/up1/up2)
    back, skipped_back = convert_torch_state_dict(sd, variables)
    assert skipped_back == []
    want = dict(flatten_tree(variables))
    got = dict(flatten_tree(back))
    assert got.keys() == want.keys()
    for path in want:
        np.testing.assert_array_equal(
            np.asarray(got[path]), np.asarray(want[path]), err_msg=str(path)
        )


def test_seg_strict_load_and_forward_parity():
    ref_unet, _ = _reference_models()
    module = PGUNet1(num_classes=1)
    variables = _randomize_batch_stats(
        module.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)), False), 3
    )
    sd, skipped = convert_variables_to_state_dict(variables)
    assert skipped == []

    ref = ref_unet.PGUNet1(in_channels=3, num_classes=1)
    ref.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    ref.eval()

    g = np.random.default_rng(4)
    x = g.random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = (
            ref(torch.from_numpy(x).permute(0, 3, 1, 2))
            .permute(0, 2, 3, 1)
            .numpy()
        )
    got = np.asarray(module.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_cls_strict_load_and_forward_parity():
    _, ref_cls = _reference_models()
    module = HerlevClassificationModel(stage=1, num_classes=7)
    variables = _randomize_batch_stats(
        module.init(jax.random.key(5), jnp.zeros((1, 32, 32, 3)), False), 6
    )
    sd, skipped = full_classifier_state_dict(variables, stage=1)
    assert skipped == []

    ref = ref_cls.HerlevClassificationModel(stage=1, num_classes=7)
    ref.load_state_dict({k: torch.from_numpy(np.array(v)) for k, v in sd.items()})
    ref.eval()

    g = np.random.default_rng(7)
    x = g.random((2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = ref(torch.from_numpy(x).permute(0, 3, 1, 2)).numpy()
    got = np.asarray(module.apply(variables, jnp.asarray(x), False))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)


def test_cls_padded_decoder_keys_do_not_clobber_trained_ones():
    module = HerlevClassificationModel(stage=1, num_classes=7)
    variables = module.init(jax.random.key(8), jnp.zeros((1, 32, 32, 3)), False)
    own_sd, _ = convert_variables_to_state_dict(variables)
    sd, _ = full_classifier_state_dict(variables, stage=1)
    for key, value in own_sd.items():
        np.testing.assert_array_equal(sd[key], value, err_msg=key)
    # decoder padding is present (stage-1 unet: down4/up1/outc)
    assert any(k.startswith("unet.down4.") for k in sd)
    assert any(k.startswith("unet.up1.") for k in sd)
    assert any(k.startswith("unet.outc.") for k in sd)


def test_export_cli_end_to_end(tmp_path):
    module = PGUNet1(num_classes=1)
    variables = _randomize_batch_stats(
        module.init(jax.random.key(9), jnp.zeros((1, 32, 32, 3)), False), 10
    )
    ckpt = tmp_path / "native_stage1"
    save_checkpoint(
        ckpt, variables,
        metadata={"stage": 1, "epoch": 4, "val_dice": 0.83,
                  "uncertainty_alpha": 1.0},
    )
    pth = tmp_path / "exported_stage1.pth"
    from ugpg_tpu.cli.export_torch import main

    assert main(["--ckpt", str(ckpt), "--out", str(pth)]) == 0
    raw = torch.load(pth, map_location="cpu", weights_only=False)
    assert raw["stage"] == 1 and raw["epoch"] == 4
    assert raw["val_dice"] == pytest.approx(0.83)
    assert all(isinstance(v, torch.Tensor)
               for v in raw["model_state_dict"].values())
    # the exported .pth reimports losslessly through our own importer
    back, skipped = convert_torch_state_dict(raw["model_state_dict"], variables)
    assert skipped == []
    want = dict(flatten_tree(variables))
    for path, value in flatten_tree(back).items():
        np.testing.assert_array_equal(
            np.asarray(value), np.asarray(want[path]), err_msg=str(path)
        )


def test_export_raw_state_dict(tmp_path):
    module = PGUNet1(num_classes=1)
    variables = module.init(jax.random.key(11), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = tmp_path / "native"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})
    pth = tmp_path / "raw.pth"
    export_torch_checkpoint(str(ckpt), str(pth), raw_state_dict=True)
    raw = torch.load(pth, map_location="cpu", weights_only=False)
    # bare tensor dict — the reference loader's raw-state-dict branch
    # (ref: test_monuseg.py:131-138) requires all values be tensors
    assert "model_state_dict" not in raw
    assert all(isinstance(v, torch.Tensor) for v in raw.values())

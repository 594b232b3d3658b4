"""Evaluator + CLI end-to-end tests on synthetic datasets."""

import json
from pathlib import Path

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import PGUNet1

from tests.test_data_herlev import write_herlev_tree
from tests.test_data_monuseg import write_monuseg_tree


@pytest.fixture(scope="module")
def seg_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt")
    module = PGUNet1(num_classes=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    return save_checkpoint(
        tmp / "seg_stage1", variables,
        metadata={"stage": 1, "val_dice": 0.5, "uncertainty_alpha": 1.0},
    )


@pytest.fixture(scope="module")
def cls_ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ckpt_cls")
    module = HerlevClassificationModel(stage=1, num_classes=7)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    return save_checkpoint(
        tmp / "herlev_stage1", variables,
        metadata={"stage": 1, "config": {"num_classes": 7,
                                         "binary_classification": False}},
    )


def test_monuseg_evaluator_load_and_predict(seg_ckpt, rng):
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator

    ev = MoNuSegEvaluator(str(seg_ckpt))
    assert ev.stage == 1 and ev.resolution == 32
    img = (rng.random((100, 120, 3)) * 255).astype(np.uint8)
    mask, conf = ev.predict_image(img)
    assert mask.shape == (100, 120)
    assert set(np.unique(mask)).issubset({0.0, 1.0})
    assert 0.0 <= conf <= 1.0
    m2, c2, unc = ev.predict_image(img, return_uncertainty=True)
    assert unc.shape == (32, 32)
    assert 0.0 <= unc.min() and unc.max() <= 1.0


def test_monuseg_evaluator_dataset_eval(seg_ckpt, tmp_path, rng):
    from ugpg_tpu.data.monuseg import MoNuSegDataset
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator

    root = write_monuseg_tree(tmp_path / "M", n_train=2, n_val=3, size=64)
    ds = MoNuSegDataset(str(root), image_size=32, split="val", augment=False)
    ev = MoNuSegEvaluator(str(seg_ckpt))
    out = tmp_path / "eval.json"
    results = ev.evaluate_dataset(ds, output_file=str(out))
    for key in ("dice_mean", "iou_mean", "precision_mean", "recall_mean",
                "specificity_mean", "accuracy_mean"):
        assert key in results and 0.0 <= results[key] <= 1.0
    assert results["num_samples"] == 3
    assert json.loads(out.read_text())["dice_mean"] == results["dice_mean"]
    # overlays
    files = ev.test_random_images(ds, num_images=2, output_dir=tmp_path / "viz")
    assert len(files) == 2 and all(Path(f).exists() for f in files)


def test_monuseg_inferer(seg_ckpt, tmp_path, rng):
    from PIL import Image

    from ugpg_tpu.eval.monuseg import MoNuSegInferer

    img_dir = tmp_path / "in"
    img_dir.mkdir()
    for i in range(2):
        arr = (rng.random((40, 40, 3)) * 255).astype(np.uint8)
        Image.fromarray(arr).save(img_dir / f"img{i}.png")
    inf = MoNuSegInferer(str(seg_ckpt))
    results = inf.infer_directory(str(img_dir), str(tmp_path / "out"))
    assert len(results) == 2
    assert (tmp_path / "out" / "img0_mask.png").exists()
    assert (tmp_path / "out" / "img0_vis.png").exists()


def test_herlev_evaluator(cls_ckpt, tmp_path):
    from ugpg_tpu.data.herlev import HerlevDataset
    from ugpg_tpu.eval.herlev import HerlevEvaluator

    root = write_herlev_tree(tmp_path / "H")
    ds = HerlevDataset(str(root), image_size=32, split="test", verbose=False)
    ev = HerlevEvaluator(str(cls_ckpt))
    results = ev.evaluate_dataset(ds, output_dir=str(tmp_path / "out"))
    assert 0.0 <= results["accuracy"] <= 1.0
    assert len(results["confusion_matrix"]) == 7
    rep = results["classification_report"]
    assert "macro avg" in rep and "weighted avg" in rep
    assert (tmp_path / "out" / "confusion_matrix.png").exists()
    assert (tmp_path / "out" / "class_metrics.png").exists()
    grid = ev.plot_sample_predictions(ds, tmp_path / "grid.png", num_samples=4)
    assert Path(grid).exists()
    # single-image prediction
    pred, name, probs = ev.predict_single(ds.samples[0])
    assert probs.shape == (7,) and name == ev.class_names[pred]


def test_test_monuseg_cli(seg_ckpt, tmp_path, rng, monkeypatch):
    from ugpg_tpu.cli.test_monuseg import main

    root = write_monuseg_tree(tmp_path / "M2", n_train=2, n_val=2, size=64)
    monkeypatch.chdir(tmp_path)
    results = main([
        "--model", str(seg_ckpt),
        "--data", str(root),
        "--num_images", "1",
        "--eval_full",
        "--output_dir", str(tmp_path / "res"),
    ])
    assert "metrics" in results
    assert (tmp_path / "res" / "evaluation_results.json").exists()


def test_demo_cli(tmp_path, monkeypatch):
    from ugpg_tpu.cli.demo import main

    monkeypatch.chdir(tmp_path)
    main(["--demo", "alpha"])
    main(["--demo", "uncertainty"])


def test_train_monuseg_cli_with_mesh(tmp_path, rng):
    """--mesh DATA,MODEL end to end through the train CLI on the fake
    8-device mesh (plain dataset path, 1 stage, 1 epoch)."""
    from ugpg_tpu.cli.train_monuseg import main as train_main

    root = write_monuseg_tree(tmp_path / "M3", n_train=4, n_val=2, size=64)
    out = tmp_path / "out_mesh"
    train_main([
        "--data_dir", str(root), "--output_dir", str(out),
        "--stages", "1", "--epochs", "1", "--batch_size", "4",
        "--plain", "--mesh", "4,2", "--checkpoint_every", "1",
    ])
    assert (out / "training_log.csv").exists()
    assert (out / "ug_pgunet_stage1_best" / "variables.msgpack").exists()


def test_train_monuseg_cli_native_finetune(tmp_path, rng):
    """--native_finetune: progressive stage 1, then a spatially-sharded
    native-resolution fine-tune epoch through the CLI, writing the _native
    checkpoint."""
    from ugpg_tpu.cli.train_monuseg import main as train_main

    root = write_monuseg_tree(tmp_path / "M4", n_train=2, n_val=2, size=48)
    out = tmp_path / "out_native"
    train_main([
        "--data_dir", str(root), "--output_dir", str(out),
        "--stages", "1", "--epochs", "1", "--batch_size", "2",
        "--plain", "--mesh", "2,1",
        "--native_finetune", "1", "--native_size", "48",
    ])
    ckpt = out / "ug_pgunet_stage1_native"
    assert (ckpt / "variables.msgpack").exists()
    import json as _json

    meta = _json.loads((ckpt / "metadata.json").read_text())
    assert meta["native_finetune"] is True and meta["stage"] == 1

    # regression: --resume with every stage already trained must STILL run
    # a requested --native_finetune phase (it used to return early)
    (ckpt / "metadata.json").unlink()
    import shutil

    shutil.rmtree(ckpt)
    train_main([
        "--data_dir", str(root), "--output_dir", str(out),
        "--stages", "1", "--epochs", "1", "--batch_size", "2",
        "--plain", "--mesh", "2,1", "--resume",
        "--native_finetune", "1", "--native_size", "48",
    ])
    assert (ckpt / "variables.msgpack").exists()


def test_train_and_test_herlev_cli_end_to_end(tmp_path):
    """Drive the full Herlev CLI loop: train 1 stage on a synthetic class
    tree, then evaluate the produced checkpoint with the test CLI."""
    from tests.test_data_herlev import write_herlev_tree
    from ugpg_tpu.cli.test_herlev import main as test_main
    from ugpg_tpu.cli.train_herlev import main as train_main

    root = write_herlev_tree(tmp_path / "H", presplit=True)
    out = tmp_path / "herlev_out"
    train_main([
        "--data_dir", str(root), "--output_dir", str(out),
        "--stages", "1", "--epochs", "1", "--batch_size", "4",
    ])
    ckpt = out / "herlev_stage1_best"
    assert (ckpt / "variables.msgpack").exists()
    assert (out / "training_log.csv").exists()

    res = tmp_path / "herlev_eval"
    test_main([
        "--model", str(ckpt), "--data_dir", str(root),
        "--split", "test", "--batch_size", "4",
        "--output_dir", str(res), "--num_samples", "4",
    ])
    import json

    metrics_files = list(res.glob("*.json"))
    assert metrics_files, "test_herlev CLI wrote no metrics JSON"
    data = json.loads(metrics_files[0].read_text())
    assert "accuracy" in json.dumps(data)


def test_augment_and_import_torch_cli(tmp_path):
    """augment_monuseg main writes the aug tree; import_torch main converts
    a reference-style .pth into a loadable checkpoint."""
    import torch

    from tests.test_torch_import import make_stage1_sd
    from ugpg_tpu.cli.augment_monuseg import main as aug_main
    from ugpg_tpu.cli.import_torch import main as import_main

    root = write_monuseg_tree(tmp_path / "M4", n_train=1, n_val=1, size=64)
    aug_main(["--data_dir", str(root), "--patch", "32", "--stride", "32",
              "--variants", "1"])
    aug_imgs = list((root / "train" / "aug" / "images").glob("*.png"))
    aug_xmls = list((root / "train" / "aug" / "annots").glob("*.xml"))
    assert aug_imgs and len(aug_imgs) == len(aug_xmls)

    import numpy as np

    g = np.random.default_rng(0)
    pth = tmp_path / "ref.pth"
    torch.save({"stage": 1, "model_state_dict": make_stage1_sd(g)}, pth)
    out = tmp_path / "imported_cli"
    import_main(["--pth", str(pth), "--out", str(out)])
    assert (out / "variables.msgpack").exists()


def test_monuseg_native_res_eval(seg_ckpt, tmp_path):
    """Native-resolution eval (VERDICT r2 #5): full-res convolutional
    forward with padding, sharded == unsharded, metrics vs full-res GT."""
    from ugpg_tpu.data.monuseg import MoNuSegDataset
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator
    from ugpg_tpu.parallel.mesh import make_mesh

    # size 60: not divisible by the 4-way mesh divisor 8 -> exercises pad
    root = write_monuseg_tree(tmp_path / "MN", n_train=1, n_val=2, size=60)
    ds = MoNuSegDataset(str(root), image_size=32, split="val", augment=False)
    ev = MoNuSegEvaluator(str(seg_ckpt))

    out = tmp_path / "native.json"
    res_plain = ev.evaluate_dataset_native(ds, output_file=str(out))
    assert res_plain["native_resolution"] and res_plain["num_samples"] == 2
    for key in ("dice_mean", "iou_mean", "accuracy_mean"):
        assert 0.0 <= res_plain[key] <= 1.0
    assert json.loads(out.read_text())["dice_mean"] == res_plain["dice_mean"]

    res_mesh = ev.evaluate_dataset_native(ds, mesh=make_mesh(4, 1))
    for k, v in res_plain.items():
        if isinstance(v, float):
            np.testing.assert_allclose(res_mesh[k], v, rtol=1e-5, atol=1e-6)

    res_grid = ev.evaluate_dataset_native(
        ds, mesh=make_mesh(2, 2), w_axis="model"
    )
    for k, v in res_plain.items():
        if isinstance(v, float):
            np.testing.assert_allclose(res_grid[k], v, rtol=1e-5, atol=1e-6)


def test_test_monuseg_cli_native_res(seg_ckpt, tmp_path, monkeypatch):
    from ugpg_tpu.cli.test_monuseg import main

    root = write_monuseg_tree(tmp_path / "MN2", n_train=1, n_val=1, size=60)
    monkeypatch.chdir(tmp_path)
    results = main([
        "--model", str(seg_ckpt),
        "--data", str(root),
        "--num_images", "0",
        "--eval_full", "--native_res", "--mesh", "2,2",
        "--output_dir", str(tmp_path / "res_native"),
    ])
    assert results["metrics"]["native_resolution"]
    assert (tmp_path / "res_native" / "evaluation_results_native.json").exists()

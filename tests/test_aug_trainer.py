"""AugMoNuSegTrainer: dataset wiring + auto pos_weight (BASELINE config 5)."""

import numpy as np
import pytest
from PIL import Image

from ugpg_tpu.train.aug_trainer import AugMoNuSegTrainer, compute_pos_weight

from tests.test_data_monuseg import make_xml, write_monuseg_tree


@pytest.fixture
def aug_root(tmp_path):
    root = write_monuseg_tree(tmp_path / "M", n_train=2, n_val=2, size=64)
    rng = np.random.default_rng(0)
    (root / "train" / "aug" / "images").mkdir(parents=True)
    (root / "train" / "aug" / "annots").mkdir(parents=True)
    for i in range(6):
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(root / "train" / "aug" / "images" / f"p{i}.png")
        (root / "train" / "aug" / "annots" / f"p{i}.xml").write_text(
            make_xml([[(8, 8), (24, 8), (24, 24), (8, 24)]])
        )
    return root


def test_setup_datasets_and_pos_weight(aug_root):
    # quarter-resolution stages: dataset wiring / pos_weight / loader glue
    # under test is resolution-independent
    cfgs = {
        1: {"resolution": 16, "epochs_per_stage": 1, "lr": 3e-4},
        2: {"resolution": 32, "epochs_per_stage": 1, "lr": 1e-4},
    }
    tr = AugMoNuSegTrainer(stage_configs=cfgs, verbose=False)
    tr.setup_datasets(str(aug_root), stages=(1, 2))
    assert set(tr.train_datasets) == {1, 2}
    # ~16x16 square in 64x64 -> r ~ 1/16 -> pos_weight ~ 15
    pw = float(tr.pos_weight)
    assert 10 < pw < 20
    # per-stage loaders feed train_progressive (one stage here keeps CPU CI
    # time bounded; the 2-stage transition is covered by test_seg_trainer)
    train_loaders, val_loaders = tr.make_loaders(batch_size=4, num_workers=2)
    hist = tr.train_progressive(
        train_loaders, val_loaders, max_stages=1, save_dir="/tmp/ugpg_aug_t"
    )
    assert len(hist["train_loss"]) == 1


def test_compute_pos_weight_balanced():
    class Half:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            m = np.zeros((4, 4, 1), np.float32)
            m[:2] = 1.0
            return None, m

    assert compute_pos_weight(Half()) == pytest.approx(1.0)


def test_config_epochs_override():
    tr = AugMoNuSegTrainer({"epochs_per_stage": 7}, verbose=False)
    assert tr.stage_configs[1]["epochs_per_stage"] == 7
    assert tr.augment is True

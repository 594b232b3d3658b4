"""Reference-trajectory parity harness.

Drives the ACTUAL reference trainers (imported from /root/reference, torch
CPU) and our fused jit steps in lockstep: identical initial weights (via the
proven torch-import mapping), identical synthetic batches, augmentation off,
then compares per-step loss/Dice/accuracy trajectories — including a
stage-1→2 transition, which composes weight transfer + BN-stat evolution +
uncertainty weighting + RMSprop (seg) / Adam + entropy weighting (cls).

This is the in-container substantiation of the BASELINE.json north star
("MoNuSeg Dice / Herlev F1 within 0.5 pt of the reference"): no dataset
ships in this environment, so step-wise trajectory agreement on the same
data is the strongest available evidence that long trainings land on the
same weights.

Reference entry points exercised:
* ``UncertaintyGuidedProgressiveTrainer.train_epoch`` + ``transfer_weights``
  (ref: uncertainty_guided_trainer.py:186-256, 125-141)
* ``HerlevTrainer.train_epoch`` + ``transfer_weights``
  (ref: Herlev/train_herlev.py:298-357, 196-214)

Determinism notes: the reference forward has no randomness except classifier
dropout, which the harness disables on BOTH sides (torch ``p=0``; our
``dropout_rates=(0,0,0)``) — dropout is the one component whose parity can
only be distributional, not bitwise.

Run as a CLI to print the side-by-side table and emit JSON:
    python tools/parity_vs_reference.py --out parity_report.json
"""

from __future__ import annotations

import copy
import io
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

_SEG_RES = {1: 32, 2: 64, 3: 128, 4: 256}
_CLS_RES = {1: 32, 2: 64, 3: 128, 4: 224}


def reference_available() -> bool:
    return (REFERENCE_ROOT / "uncertainty_guided_trainer.py").exists()


def _import_reference():
    """Import the reference modules from /root/reference (read-only)."""
    for p in (str(REFERENCE_ROOT), str(REFERENCE_ROOT / "Herlev")):
        if p not in sys.path:
            sys.path.insert(0, p)
    # torchvision is not installed in this container; the reference's
    # dataset modules import it at module level.  The aug-pos_weight arm
    # actually EXERCISES Compose/Resize/ToTensor (the reference's
    # setup_datasets iterates AugMoNuSegDataset with transform=True,
    # augment=False: PIL resize + ToTensor; ref aug_monuseg_dataset.py:
    # 144-165), so those three get faithful minimal implementations; the
    # augment-only TF.* functional hooks are never called by the harness
    # and stay absent.
    if "torchvision" not in sys.modules:
        import types

        import torch

        class _Compose:
            def __init__(self, ts):
                self.ts = ts

            def __call__(self, x):
                for t in self.ts:
                    x = t(x)
                return x

        class _Resize:
            def __init__(self, size):
                self.size = size if isinstance(size, tuple) else (size, size)

            def __call__(self, pic):
                from PIL import Image

                return pic.resize(self.size[::-1], Image.BILINEAR)

        class _ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic)
                if arr.ndim == 2:
                    arr = arr[None]
                else:
                    arr = arr.transpose(2, 0, 1)
                if arr.dtype == np.uint8:
                    arr = arr.astype(np.float32) / 255.0
                return torch.from_numpy(np.ascontiguousarray(arr))

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        tf = types.ModuleType("torchvision.transforms.functional")
        tr.__path__ = []  # mark as package so the .functional import resolves
        tr.Compose, tr.Resize, tr.ToTensor = _Compose, _Resize, _ToTensor
        tv.transforms = tr
        tr.functional = tf
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tr
        sys.modules["torchvision.transforms.functional"] = tf
    import uncertainty_guided_trainer as ref_seg  # noqa: E402
    import train_herlev as ref_cls  # noqa: E402

    return ref_seg, ref_cls


# ---------------------------------------------------------------------------
# synthetic lockstep data (learnable: blob masks with mask-correlated images)
# ---------------------------------------------------------------------------

def make_seg_batches(n_batches: int, batch_size: int, size: int, seed: int = 0):
    """List of (images NHWC f32 [0,1], masks NHW1 f32 {0,1}) numpy batches."""
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32)
    batches = []
    for _ in range(n_batches):
        imgs = np.empty((batch_size, size, size, 3), np.float32)
        masks = np.empty((batch_size, size, size, 1), np.float32)
        for b in range(batch_size):
            cy, cx = g.uniform(0.25 * size, 0.75 * size, 2)
            r = g.uniform(0.12 * size, 0.3 * size)
            m = (((yy - cy) ** 2 + (xx - cx) ** 2) < r * r).astype(np.float32)
            noise = g.random((size, size, 3), np.float32)
            img = 0.55 * m[..., None] + 0.25 * noise + 0.1
            imgs[b] = np.clip(img, 0.0, 1.0)
            masks[b, ..., 0] = m
        batches.append((imgs, masks))
    return batches


def make_cls_batches(n_batches: int, batch_size: int, size: int,
                     num_classes: int, seed: int = 0):
    """List of (images NHWC f32, labels (B,) int) — class-dependent means so
    the task is learnable and trajectories are meaningful."""
    g = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        labels = g.integers(0, num_classes, batch_size)
        imgs = g.random((batch_size, size, size, 3), np.float32) * 0.4
        for b, lab in enumerate(labels):
            imgs[b] += 0.5 * (lab + 1) / num_classes
        batches.append((np.clip(imgs, 0, 1).astype(np.float32),
                        labels.astype(np.int64)))
    return batches


_XML_TEMPLATE = """<?xml version="1.0"?>
<Annotations MicronsPerPixel="0.25">
  <Annotation><Regions>{regions}</Regions></Annotation>
</Annotations>"""


def build_tiny_monuseg_dir(root, size: int = 64, n_train: int = 2,
                           n_val: int = 2, n_aug: int = 6, seed: int = 0):
    """Write a minimal on-disk MoNuSeg tree (train/val/train-aug, .tif +
    Aperio-style XML) that BOTH data layers can read — the substrate for
    lockstep-driving the reference's AugMoNuSegTrainer.setup_datasets
    (auto pos_weight, ref: train_aug_monuseg.py:94-121) against ours."""
    from PIL import Image

    root = Path(root)
    g = np.random.default_rng(seed)

    def poly_xml(polys):
        regions = "".join(
            "<Region><Vertices>"
            + "".join(f'<Vertex X="{x}" Y="{y}"/>' for x, y in poly)
            + "</Vertices></Region>"
            for poly in polys
        )
        return _XML_TEMPLATE.format(regions=regions)

    def nucleus(cx, cy, r):
        return [(cx - r, cy - r), (cx + r, cy - r), (cx + r, cy + r),
                (cx - r, cy + r)]

    layouts = [
        ("train", n_train, root / "train"),
        ("val", n_val, root / "val"),
        ("aug", n_aug, root / "train" / "aug"),
    ]
    for tag, n, base in layouts:
        (base / "images").mkdir(parents=True, exist_ok=True)
        (base / "annots").mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = (g.random((size, size, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(base / "images" / f"{tag}_{i}.tif")
            polys = [
                nucleus(int(g.uniform(12, size - 12)),
                        int(g.uniform(12, size - 12)),
                        int(g.uniform(4, 9)))
                for _ in range(3)
            ]
            (base / "annots" / f"{tag}_{i}.xml").write_text(poly_xml(polys))
    return root


def run_reference_seg_aug(data_dir, batches, steps_per_stage: dict[int, int],
                          alpha: float = 1.0, seed: int = 0):
    """Lockstep-drive the reference's AugMoNuSegTrainer — its REAL
    setup_datasets computes ``pos_weight=(1-r)/r`` from the on-disk masks
    and swaps base_criterion (ref: train_aug_monuseg.py:94-121); training
    then proceeds over the harness's synthetic batches so trajectories are
    comparable.  Returns (pos_weight, init_state_dicts, records)."""
    import torch

    _import_reference()
    ref_root = str(REFERENCE_ROOT / "MoNuSegImprove")
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    import train_aug_monuseg as ref_aug  # noqa: E402

    torch.manual_seed(seed)
    config = {
        "data_dir": str(data_dir),
        "in_channels": 3,
        "num_classes": 1,
        "device": "cpu",
        "uncertainty_alpha": alpha,
        "num_epochs_per_stage": 1,
        "val_ratio": 0.2,
    }
    with redirect_stdout(io.StringIO()):
        trainer = ref_aug.AugMoNuSegTrainer(config)
        trainer.setup_datasets()
    pos_weight = float(trainer.base_criterion.pos_weight.item())
    stages = sorted(steps_per_stage)
    init_sds = {
        s: copy.deepcopy(trainer.models[s].state_dict()) for s in stages
    }
    records = []
    with redirect_stdout(io.StringIO()):
        for stage in stages:
            if stage > 1:
                trainer.transfer_weights(stage - 1, stage)
            trainer.current_stage = stage
            trainer.current_model = trainer.models[stage]
            trainer.setup_optimizer(stage)
            for step in range(steps_per_stage[stage]):
                batch = _to_torch_seg(batches[step % len(batches)])
                loss, base, dice, acc, um, us = trainer.train_epoch(
                    [batch], stage
                )
                records.append(dict(stage=stage, step=step, final_loss=loss,
                                    base_loss=base, dice=dice, accuracy=acc,
                                    unc_mean=um, unc_std=us))
    return pos_weight, init_sds, records


def run_ours_seg_aug(data_dir, init_sds, batches,
                     steps_per_stage: dict[int, int], alpha: float = 1.0):
    """Our AugMoNuSegTrainer's REAL setup_datasets computes pos_weight from
    the same on-disk masks (train/aug_trainer.py::compute_pos_weight), then
    the fused steps train with it.  Returns (pos_weight, records)."""
    from ugpg_tpu.train.aug_trainer import AugMoNuSegTrainer

    with redirect_stdout(io.StringIO()):
        tr = AugMoNuSegTrainer(verbose=False)
        tr.setup_datasets(str(data_dir))
    pos_weight = float(tr.pos_weight)
    return pos_weight, run_ours_seg(
        init_sds, batches, steps_per_stage, alpha=alpha,
        pos_weight=pos_weight,
    )


def _to_torch_seg(batch):
    import torch

    imgs, masks = batch
    return (torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(masks).permute(0, 3, 1, 2).contiguous())


def _to_torch_cls(batch):
    import torch

    imgs, labels = batch
    return (torch.from_numpy(imgs).permute(0, 3, 1, 2).contiguous(),
            torch.from_numpy(labels))


# ---------------------------------------------------------------------------
# segmentation: reference side
# ---------------------------------------------------------------------------

def run_reference_seg(batches, steps_per_stage: dict[int, int],
                      alpha: float = 1.0, seed: int = 0, quiet: bool = True):
    """Drive the reference's own train_epoch one batch at a time.

    Returns (init_state_dicts, records): records[i] = dict(stage, step,
    final_loss, base_loss, dice, accuracy, unc_mean, unc_std).
    """
    import torch

    ref_seg, _ = _import_reference()
    torch.manual_seed(seed)
    trainer = ref_seg.UncertaintyGuidedProgressiveTrainer(
        device="cpu", uncertainty_alpha=alpha
    )
    stages = sorted(steps_per_stage)
    init_sds = {
        s: copy.deepcopy(trainer.models[s].state_dict()) for s in stages
    }
    records = []
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        for stage in stages:
            if stage > 1:
                trainer.transfer_weights(stage - 1, stage)
            trainer.current_stage = stage
            trainer.current_model = trainer.models[stage]
            trainer.setup_optimizer(stage)
            for step in range(steps_per_stage[stage]):
                batch = _to_torch_seg(batches[step % len(batches)])
                loss, base, dice, acc, um, us = trainer.train_epoch([batch], stage)
                records.append(dict(stage=stage, step=step, final_loss=loss,
                                    base_loss=base, dice=dice, accuracy=acc,
                                    unc_mean=um, unc_std=us))
    return init_sds, records


# ---------------------------------------------------------------------------
# segmentation: our side
# ---------------------------------------------------------------------------

def run_ours_seg(init_sds, batches, steps_per_stage: dict[int, int],
                 alpha: float = 1.0, fused_loss: bool = False,
                 pos_weight: float = 5.0):
    """Run our fused jit train steps from the reference's initial weights.

    Composes OUR torch-import mapping, OUR transfer_weights, OUR resize /
    uncertainty / loss / RMSprop — so a trajectory match validates the whole
    chain, not just the forward pass.
    """
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.io.torch_import import convert_torch_state_dict
    from ugpg_tpu.models.pgunet import STAGE_MODELS
    from ugpg_tpu.progressive.transfer import transfer_weights
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    stages = sorted(steps_per_stage)
    modules = {s: STAGE_MODELS[s](num_classes=1) for s in stages}
    init_vars = {}
    for s in stages:
        template = modules[s].init(
            jax.random.key(s), jnp.zeros((1, _SEG_RES[s], _SEG_RES[s], 3)), False
        )
        init_vars[s], skipped = convert_torch_state_dict(init_sds[s], template)
        assert not skipped, f"unmapped reference keys at stage {s}: {skipped[:5]}"

    records = []
    prev_final = None
    # default 5.0: ref uncertainty_guided_trainer.py:64; the aug path
    # overrides with its auto-computed (1-r)/r (run_ours_seg_aug)
    pos_weight = jnp.asarray(pos_weight, jnp.float32)
    for stage in stages:
        if stage > 1:
            variables, _ = transfer_weights(prev_final, init_vars[stage])
        else:
            variables = init_vars[stage]
        lr = 3e-4 if stage == 1 else 1e-4
        tx = torch_rmsprop(lr, weight_decay=1e-4)
        prev_module = modules.get(stage - 1)
        step_fn = make_seg_train_step(
            modules[stage], tx, stage, _SEG_RES[stage],
            prev_module=prev_module,
            prev_resolution=_SEG_RES.get(stage - 1),
            alpha=alpha, donate=False, fused_loss=fused_loss,
        )
        state = TrainState.create(variables, tx)
        prev_vars = prev_final if stage > 1 else {}
        for step in range(steps_per_stage[stage]):
            imgs, masks = batches[step % len(batches)]
            state, m = step_fn(
                state, prev_vars, (jnp.asarray(imgs), jnp.asarray(masks)),
                pos_weight, jax.random.key(step),
            )
            records.append(dict(
                stage=stage, step=step,
                final_loss=float(m["final_loss"]),
                base_loss=float(m["base_loss"]),
                dice=float(m["dice"]), accuracy=float(m["accuracy"]),
                unc_mean=float(m["uncertainty_weight_mean"]),
                unc_std=float(m["uncertainty_weight_std"]),
            ))
        prev_final = state.variables
    return records


# ---------------------------------------------------------------------------
# classification (Herlev): reference side
# ---------------------------------------------------------------------------

def _disable_torch_dropout(model):
    import torch

    for m in model.modules():
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0


def run_reference_cls(batches, steps_per_stage: dict[int, int],
                      num_classes: int = 7, class_weights=None,
                      alpha: float = 1.0, seed: int = 0, quiet: bool = True):
    import torch

    _, ref_cls = _import_reference()
    torch.manual_seed(seed)
    config = {
        "device": "cpu",
        "num_classes": num_classes,
        "epochs_per_stage": 1,
        "class_weights": class_weights,
        "weight_decay": 1e-4,
        "uncertainty_alpha": alpha,
        "log_interval": 10 ** 9,
    }
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        trainer = ref_cls.HerlevTrainer(config)
    stages = sorted(steps_per_stage)
    for s in trainer.models:
        _disable_torch_dropout(trainer.models[s])
    init_sds = {
        s: copy.deepcopy(trainer.models[s].state_dict()) for s in stages
    }
    records = []
    with redirect_stdout(sink):
        for stage in stages:
            trainer.setup_optimizer_scheduler(stage)
            if stage > 1:
                trainer.transfer_weights(stage - 1, stage)
            trainer.current_stage = stage
            for step in range(steps_per_stage[stage]):
                batch = _to_torch_cls(batches[step % len(batches)])
                loss, base, acc, um, us = trainer.train_epoch([batch], stage)
                records.append(dict(stage=stage, step=step, final_loss=loss,
                                    base_loss=base, accuracy=acc,
                                    unc_mean=um, unc_std=us))
    return init_sds, records


# ---------------------------------------------------------------------------
# classification: our side
# ---------------------------------------------------------------------------

def run_ours_cls(init_sds, batches, steps_per_stage: dict[int, int],
                 num_classes: int = 7, class_weights=None, alpha: float = 1.0):
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.io.torch_import import convert_torch_state_dict
    from ugpg_tpu.models.classifier import HerlevClassificationModel
    from ugpg_tpu.progressive.transfer import flatten_tree, unflatten_tree
    from ugpg_tpu.train.optim import torch_adam
    from ugpg_tpu.train.steps import TrainState, make_cls_train_step

    stages = sorted(steps_per_stage)
    modules = {
        s: HerlevClassificationModel(stage=s, num_classes=num_classes,
                                     dropout_rates=(0.0, 0.0, 0.0))
        for s in stages
    }
    init_vars = {}
    for s in stages:
        template = modules[s].init(
            jax.random.key(s), jnp.zeros((1, _CLS_RES[s], _CLS_RES[s], 3)), False
        )
        init_vars[s], skipped = convert_torch_state_dict(init_sds[s], template)
        # the torch model's unused U-Net decoder keys have no destination
        assert all(
            any(t in k for t in ("down4", "up", "outc")) for k in skipped
        ), f"unexpected unmapped keys: {skipped[:5]}"

    cw = (jnp.asarray(class_weights, jnp.float32)
          if class_weights is not None else None)
    records = []
    prev_final = None
    head_keys = ("fc1", "fc2", "fc3")
    for stage in stages:
        variables = init_vars[stage]
        if stage > 1:
            # classifier-head zip-transfer on exact shape match (ref: :196-214)
            prev_flat = flatten_tree(prev_final)
            cur_flat = dict(flatten_tree(variables))
            for path, pv in prev_flat.items():
                if (len(path) >= 2 and path[1] in head_keys and path in cur_flat
                        and pv.shape == cur_flat[path].shape):
                    cur_flat[path] = jnp.copy(pv)
            variables = unflatten_tree(cur_flat)
        lr = 3e-4 if stage == 1 else 1e-4
        tx = torch_adam(lr, weight_decay=1e-4)
        step_fn = make_cls_train_step(
            modules[stage], tx, stage, _CLS_RES[stage], num_classes,
            prev_module=modules.get(stage - 1),
            prev_resolution=_CLS_RES.get(stage - 1),
            alpha=alpha, donate=False,
        )
        state = TrainState.create(variables, tx)
        prev_vars = prev_final if stage > 1 else {}
        for step in range(steps_per_stage[stage]):
            imgs, labels = batches[step % len(batches)]
            state, m = step_fn(
                state, prev_vars, (jnp.asarray(imgs), jnp.asarray(labels)),
                cw, jax.random.key(step),
            )
            records.append(dict(
                stage=stage, step=step,
                final_loss=float(m["final_loss"]),
                base_loss=float(m["base_loss"]),
                accuracy=100.0 * float(m["correct"]) / float(m["count"]),
                unc_mean=float(m["uncertainty_weight_mean"]),
                unc_std=float(m["uncertainty_weight_std"]),
            ))
        prev_final = state.variables
    return records


# ---------------------------------------------------------------------------
# comparison / report
# ---------------------------------------------------------------------------

def compare(ref_records, our_records, fields=("final_loss", "base_loss")):
    """Max |Δ| and max relative Δ per field across lockstep records."""
    assert len(ref_records) == len(our_records)
    out = {}
    for f in fields:
        diffs = [abs(r[f] - o[f]) for r, o in zip(ref_records, our_records)]
        rels = [
            abs(r[f] - o[f]) / max(abs(r[f]), 1e-8)
            for r, o in zip(ref_records, our_records)
        ]
        out[f] = {"max_abs": max(diffs), "max_rel": max(rels)}
    return out


def _print_table(name, ref_records, our_records, fields):
    print(f"\n== {name} ==")
    hdr = "stage step " + "  ".join(f"{f}(ref/ours)" for f in fields)
    print(hdr)
    for r, o in zip(ref_records, our_records):
        row = f"{r['stage']:>5} {r['step']:>4} " + "  ".join(
            f"{r[f]:.5f}/{o[f]:.5f}" for f in fields
        )
        print(row)


def run_reference_seg_perturbed(batches, steps_per_stage, eps: float = 1e-6,
                                alpha: float = 1.0, seed: int = 0):
    """Chaos control: the reference vs itself with eps-perturbed initial
    weights.  The resulting self-divergence calibrates how much trajectory
    drift pure fp noise produces under RMSprop — our-vs-reference deviations
    of the same magnitude are attributable to chaos, not semantics."""
    import torch

    ref_seg, _ = _import_reference()
    torch.manual_seed(seed)
    trainer = ref_seg.UncertaintyGuidedProgressiveTrainer(
        device="cpu", uncertainty_alpha=alpha
    )
    g = torch.Generator().manual_seed(123)
    for s in sorted(steps_per_stage):
        with torch.no_grad():
            for p_ in trainer.models[s].parameters():
                p_ += eps * torch.randn(p_.shape, generator=g)
    records = []
    with redirect_stdout(io.StringIO()):
        for stage in sorted(steps_per_stage):
            if stage > 1:
                trainer.transfer_weights(stage - 1, stage)
            trainer.current_stage = stage
            trainer.current_model = trainer.models[stage]
            trainer.setup_optimizer(stage)
            for step in range(steps_per_stage[stage]):
                batch = _to_torch_seg(batches[step % len(batches)])
                loss, base, dice, acc, um, us = trainer.train_epoch([batch], stage)
                records.append(dict(stage=stage, step=step, final_loss=loss,
                                    base_loss=base, dice=dice, accuracy=acc,
                                    unc_mean=um, unc_std=us))
    return records


def main(argv=None):
    import argparse
    import json

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon override; local math

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=10, help="steps per stage")
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--stages", type=int, nargs="+", default=[1, 2])
    p.add_argument("--out", default=None, help="write JSON report here")
    p.add_argument("--chaos_control", action="store_true",
                   help="also run the reference vs an eps-perturbed copy of "
                        "itself to calibrate fp-chaos drift")
    p.add_argument("--aug", action="store_true",
                   help="also lockstep the AugMoNuSegTrainer auto-pos_weight "
                        "path (both setup_datasets on a tiny on-disk tree)")
    args = p.parse_args(argv)

    plan = {s: args.steps for s in args.stages}
    report = {}

    seg_batches = make_seg_batches(4, args.batch_size, 64, seed=0)
    init_sds, ref_rec = run_reference_seg(seg_batches, plan)
    our_rec = run_ours_seg(init_sds, seg_batches, plan)
    _print_table("segmentation (RMSprop + uncertainty-weighted BCE)",
                 ref_rec, our_rec,
                 ("final_loss", "dice", "unc_mean"))
    report["segmentation"] = compare(
        ref_rec, our_rec, ("final_loss", "base_loss", "dice", "accuracy",
                           "unc_mean", "unc_std"))

    if args.chaos_control:
        pert_rec = run_reference_seg_perturbed(seg_batches, plan)
        report["segmentation_torch_self_divergence_eps1e-6"] = compare(
            ref_rec, pert_rec, ("final_loss", "base_loss", "dice"))

    if args.aug:
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            data_dir = build_tiny_monuseg_dir(Path(td) / "M")
            ref_pw, init_sds, ref_rec = run_reference_seg_aug(
                data_dir, seg_batches, plan
            )
            our_pw, our_rec = run_ours_seg_aug(
                data_dir, init_sds, seg_batches, plan
            )
        _print_table(
            f"aug-MoNuSeg (auto pos_weight ref={ref_pw:.3f} ours={our_pw:.3f})",
            ref_rec, our_rec, ("final_loss", "dice", "unc_mean"))
        report["aug_monuseg"] = compare(
            ref_rec, our_rec, ("final_loss", "base_loss", "dice", "accuracy",
                               "unc_mean", "unc_std"))
        report["aug_monuseg"]["pos_weight"] = {
            "ref": ref_pw, "ours": our_pw,
            "rel": abs(ref_pw - our_pw) / max(abs(ref_pw), 1e-8),
        }

    cls_batches = make_cls_batches(4, args.batch_size, 64, 7, seed=1)
    cw = [0.5, 1.5, 1.0, 2.0, 0.8, 1.2, 1.0]
    init_sds, ref_rec = run_reference_cls(cls_batches, plan, class_weights=cw)
    our_rec = run_ours_cls(init_sds, cls_batches, plan, class_weights=cw)
    _print_table("classification (Adam + entropy-weighted CE)",
                 ref_rec, our_rec, ("final_loss", "accuracy", "unc_mean"))
    report["classification"] = compare(
        ref_rec, our_rec, ("final_loss", "base_loss", "accuracy",
                           "unc_mean", "unc_std"))

    print("\n== max deviations ==")
    print(json.dumps(report, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(report, f, indent=2)
        print(f"report -> {args.out}")


if __name__ == "__main__":
    main()

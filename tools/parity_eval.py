"""Imported-checkpoint EVAL equivalence vs the reference CLIs.

Closes the parity story at the evaluation level (the strongest
container-feasible substitute for the 0.5-pt Dice/F1 north star, given no
dataset ships here):

1. Build a synthetic on-disk dataset in the reference's exact layout
   (MoNuSeg: ``val/images/*.tif`` + ``val/annots/*.xml`` polygon
   annotations; Herlev: pre-split ``{split}/{class}/*.bmp`` trees).
2. Train the REFERENCE trainers briefly on it (torch CPU — the reference's
   own ``UncertaintyGuidedProgressiveTrainer.train_epoch`` /
   ``HerlevTrainer.train_epoch``, ref: uncertainty_guided_trainer.py:186-256,
   Herlev/train_herlev.py:298-357) and save ``.pth`` checkpoints in the
   reference's own formats (ref: uncertainty_guided_trainer.py:384-393,
   train_herlev.py:466-479).
3. Run the reference eval CLIs' evaluator classes on them
   (ref: MoNuSegImprove/test_monuseg.py:203-297, Herlev/test_herlev.py:143-330).
4. Import the same ``.pth`` through our torch-import mapping
   (io/torch_import.py) and run OUR evaluators
   (eval/monuseg.py, eval/herlev.py) on the same on-disk data.
5. Assert the metric JSONs agree (seg: mean/std of
   iou/dice/accuracy/precision/recall/specificity; cls: accuracy,
   per-class P/R/F1/support, macro/weighted averages, confusion matrix,
   per-class accuracy, macro ROC-AUC).

Segmentation compares at stage 4 — the only stage where the two eval
pipelines are defined on the same footing (the reference always evaluates
at image_size=256; our evaluator runs each checkpoint at its stage's
native resolution, which coincides at stage 4).

The reference's Herlev eval path imports torchvision (absent here); the
harness installs a minimal functional stub of the four eval-path
transforms (Resize/ToTensor/Normalize/Compose — deterministic resize +
scale + normalize only, faithful to torchvision eval semantics on square
inputs).

Run: ``python tools/parity_eval.py --out PARITY_EVAL.json``
"""

from __future__ import annotations

import io
import json
import sys
from contextlib import redirect_stdout
from pathlib import Path

import numpy as np

REFERENCE_ROOT = Path("/root/reference")
_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

HERLEV_CLASSES = [
    "carcinoma_in_situ",
    "light_dysplastic",
    "moderate_dysplastic",
    "normal_columnar",
    "normal_intermediate",
    "normal_superficiel",
    "severe_dysplastic",
]


def reference_available() -> bool:
    return (REFERENCE_ROOT / "MoNuSegImprove" / "test_monuseg.py").exists()


# ---------------------------------------------------------------------------
# torchvision stub (eval-path transforms only)
# ---------------------------------------------------------------------------


def _install_torchvision_stub():
    """Functional Resize/ToTensor/Normalize/Compose so the reference's
    Herlev eval path (herlev_dataset._setup_transforms, augment=False) runs
    without torchvision.  Semantics match torchvision's eval behavior for
    square inputs: PIL bilinear resize, HWC uint8 -> CHW float/255,
    channelwise (x - mean) / std."""
    import types

    import torch
    from PIL import Image

    class Compose:
        def __init__(self, ts):
            self.ts = ts

        def __call__(self, x):
            for t in self.ts:
                x = t(x)
            return x

    class Resize:
        def __init__(self, size, **_):
            self.size = size

        def __call__(self, img):
            if isinstance(self.size, int):
                w, h = img.size
                if w == h:
                    tw = th = self.size
                else:  # shorter-side semantics
                    if w < h:
                        tw, th = self.size, round(self.size * h / w)
                    else:
                        tw, th = round(self.size * w / h), self.size
            else:
                th, tw = self.size
            return img.resize((tw, th), Image.BILINEAR)

    class ToTensor:
        def __call__(self, img):
            arr = np.asarray(img, dtype=np.float32) / 255.0
            return torch.from_numpy(arr.transpose(2, 0, 1).copy())

    class Normalize:
        def __init__(self, mean, std):
            self.mean = torch.tensor(mean).view(3, 1, 1)
            self.std = torch.tensor(std).view(3, 1, 1)

        def __call__(self, t):
            return (t - self.mean) / self.std

    def to_tensor(img):
        return ToTensor()(img)

    def resize(t, size, **_):
        raise NotImplementedError("eval path never hits functional.resize")

    # MUTATE any pre-existing stub modules (tools/parity_vs_reference
    # installs a minimal one) instead of replacing them: reference modules
    # imported earlier hold references to those module objects.
    tv = sys.modules.get("torchvision") or types.ModuleType("torchvision")
    tr = (sys.modules.get("torchvision.transforms")
          or types.ModuleType("torchvision.transforms"))
    tf = (sys.modules.get("torchvision.transforms.functional")
          or types.ModuleType("torchvision.transforms.functional"))
    tr.__path__ = []
    tr.Compose, tr.Resize, tr.ToTensor, tr.Normalize = (
        Compose, Resize, ToTensor, Normalize,
    )
    tf.to_tensor, tf.resize = to_tensor, resize
    tv.transforms = tr
    tr.functional = tf
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.transforms"] = tr
    sys.modules["torchvision.transforms.functional"] = tf


def _import_reference_eval():
    _install_torchvision_stub()
    for p in (
        str(REFERENCE_ROOT),
        str(REFERENCE_ROOT / "MoNuSegImprove"),
        str(REFERENCE_ROOT / "Herlev"),
    ):
        if p not in sys.path:
            sys.path.insert(0, p)
    import test_herlev as ref_test_herlev  # noqa: E402
    import test_monuseg as ref_test_monuseg  # noqa: E402

    return ref_test_monuseg, ref_test_herlev


# ---------------------------------------------------------------------------
# synthetic on-disk datasets (reference directory layouts)
# ---------------------------------------------------------------------------


def make_monuseg_val_on_disk(root: Path, n_images: int = 6, size: int = 256,
                             seed: int = 0):
    """``val/images/img_i.tif`` + ``val/annots/img_i.xml`` with random
    polygon "nuclei"; images correlate with the rasterized masks so a brief
    training polarizes predictions.  Returns (images u8 NHWC, masks f32)."""
    from PIL import Image

    from ugpg_tpu.data.rasterize import rasterize_polygons

    g = np.random.default_rng(seed)
    (root / "val" / "images").mkdir(parents=True, exist_ok=True)
    (root / "val" / "annots").mkdir(parents=True, exist_ok=True)
    all_imgs, all_masks = [], []
    for i in range(n_images):
        polys = []
        for _ in range(int(g.integers(4, 8))):
            cy, cx = g.uniform(0.15 * size, 0.85 * size, 2)
            r = g.uniform(0.04 * size, 0.12 * size)
            ang = np.linspace(0, 2 * np.pi, 20, endpoint=False)
            rad = r * (1 + 0.2 * g.standard_normal(ang.shape))
            xs = cx + rad * np.cos(ang)
            ys = cy + rad * np.sin(ang)
            polys.append(np.clip(np.stack([xs, ys], 1), 0, size - 1))
        mask = rasterize_polygons(polys, (size, size), backend="pil")
        noise = g.random((size, size, 3), np.float32)
        img = np.clip(0.55 * mask[..., None] + 0.25 * noise + 0.1, 0, 1)
        img_u8 = (img * 255).astype(np.uint8)
        Image.fromarray(img_u8).save(root / "val" / "images" / f"img_{i}.tif")
        verts = "".join(
            "".join(f'<Vertex X="{x:.2f}" Y="{y:.2f}"/>' for x, y in poly)
            for poly in []
        )
        regions = "".join(
            "<Region><Vertices>"
            + "".join(f'<Vertex X="{x:.4f}" Y="{y:.4f}"/>' for x, y in poly)
            + "</Vertices></Region>"
            for poly in polys
        )
        xml = (
            "<Annotations><Annotation><Regions>"
            + regions
            + "</Regions></Annotation></Annotations>"
        )
        (root / "val" / "annots" / f"img_{i}.xml").write_text(xml)
        all_imgs.append(img_u8)
        all_masks.append(mask.astype(np.float32))
    return np.stack(all_imgs), np.stack(all_masks)


def make_herlev_on_disk(root: Path, per_class: int = 4, size: int = 32,
                        seed: int = 1, splits=("train", "val", "test")):
    """Pre-split ``{split}/{class}/*.bmp`` tree with class-dependent color
    statistics (learnable)."""
    from PIL import Image

    g = np.random.default_rng(seed)
    for split in splits:
        for ci, cname in enumerate(HERLEV_CLASSES):
            d = root / split / cname
            d.mkdir(parents=True, exist_ok=True)
            for j in range(per_class):
                img = g.random((size, size, 3), np.float32) * 0.35
                img[..., ci % 3] += 0.45 * (ci + 1) / len(HERLEV_CLASSES)
                img += 0.1
                arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
                Image.fromarray(arr).save(d / f"{split}_{cname}_{j}.bmp")


# ---------------------------------------------------------------------------
# brief reference training -> reference-format .pth checkpoints
# ---------------------------------------------------------------------------


def train_reference_seg_stage4(images_u8, masks, steps: int, batch: int,
                               seed: int = 0, quiet: bool = True):
    """Drive the reference trainer's own train_epoch at stage 4 (uncertainty
    pass against the frozen stage-3 model included) and return the trainer.
    """
    import torch

    from tools.parity_vs_reference import _import_reference

    ref_seg, _ = _import_reference()
    torch.manual_seed(seed)
    trainer = ref_seg.UncertaintyGuidedProgressiveTrainer(device="cpu")
    trainer.current_stage = 4
    trainer.current_model = trainer.models[4]
    trainer.setup_optimizer(4)

    imgs = images_u8.astype(np.float32) / 255.0
    n = imgs.shape[0]
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        for step in range(steps):
            sel = [(step * batch + k) % n for k in range(batch)]
            bi = torch.from_numpy(imgs[sel]).permute(0, 3, 1, 2).contiguous()
            bm = torch.from_numpy(masks[sel])[:, None]
            trainer.train_epoch([(bi, bm)], 4)
    return trainer


def save_reference_seg_checkpoint(trainer, path: Path, epoch: int = 1):
    """Reference best-checkpoint dict (ref: uncertainty_guided_trainer.py:384-393)."""
    import torch

    torch.save(
        {
            "stage": 4,
            "epoch": epoch,
            "model_state_dict": trainer.models[4].state_dict(),
            "optimizer_state_dict": trainer.optimizer.state_dict(),
            "val_dice": 0.0,
            "train_dice": 0.0,
            "uncertainty_alpha": trainer.uncertainty_guided_loss.uncertainty_alpha
            if hasattr(trainer, "uncertainty_guided_loss") else 1.0,
        },
        path,
    )


def train_reference_cls_stage1(root: Path, steps: int, batch: int,
                               num_classes: int = 7, seed: int = 0,
                               quiet: bool = True):
    """Brief reference HerlevTrainer stage-1 training on the on-disk train
    split; returns (trainer, config)."""
    import torch

    from tools.parity_vs_reference import _import_reference

    _, ref_cls = _import_reference()
    _install_torchvision_stub()  # dataset transforms for the on-disk loader

    torch.manual_seed(seed)
    config = {
        "device": "cpu",
        "num_classes": num_classes,
        "epochs_per_stage": 1,
        "class_weights": None,
        "weight_decay": 1e-4,
        "uncertainty_alpha": 1.0,
        "log_interval": 10 ** 9,
        "binary_classification": False,
    }
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        trainer = ref_cls.HerlevTrainer(config)
        trainer.current_stage = 1
        trainer.setup_optimizer_scheduler(1)

        import herlev_dataset as ref_hd

        ds = ref_hd.HerlevDataset(
            data_dir=str(root), image_size=32, split="train",
            transform=True, augment=False,
        )
        xs, ys = zip(*(ds[i] for i in range(len(ds))))
        xs = torch.stack(list(xs))
        ys = torch.tensor(list(ys))
        n = xs.shape[0]
        for step in range(steps):
            sel = [(step * batch + k) % n for k in range(batch)]
            trainer.train_epoch([(xs[sel], ys[sel])], 1)
    return trainer, config


def save_reference_cls_checkpoint(trainer, config, path: Path, epoch: int = 1):
    """Reference Herlev checkpoint embedding the config
    (ref: train_herlev.py:466-479)."""
    import torch

    torch.save(
        {
            "stage": 1,
            "epoch": epoch,
            "model_state_dict": trainer.models[1].state_dict(),
            "val_acc": 0.0,
            "config": config,
        },
        path,
    )


# ---------------------------------------------------------------------------
# the parity runs
# ---------------------------------------------------------------------------


def run_seg_parity(workdir: Path, n_images: int = 6, steps: int = 32,
                   batch: int = 2, quiet: bool = True) -> dict:
    """Returns a report dict with reference/ours metric values and deltas."""
    workdir = Path(workdir)
    data_root = workdir / "monuseg"
    images_u8, masks = make_monuseg_val_on_disk(data_root, n_images)

    trainer = train_reference_seg_stage4(images_u8, masks, steps, batch,
                                         quiet=quiet)
    pth = workdir / "ug_pgunet_stage4_best.pth"
    save_reference_seg_checkpoint(trainer, pth)

    # reference eval CLI
    ref_test_monuseg, _ = _import_reference_eval()
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        ref_eval = ref_test_monuseg.MoNuSegEvaluator(str(pth), device="cpu")
        ref_avg, ref_std = ref_eval.evaluate_dataset(str(data_root), "val")

    # ours: import the .pth, evaluate with our CLI-backing evaluator
    from ugpg_tpu.data.monuseg import MoNuSegDataset
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator
    from ugpg_tpu.io.torch_import import import_torch_checkpoint

    ckpt_dir = workdir / "imported_stage4"
    with redirect_stdout(sink):
        import_torch_checkpoint(str(pth), output_dir=str(ckpt_dir))
        ours = MoNuSegEvaluator(str(ckpt_dir))
        ds = MoNuSegDataset(str(data_root), image_size=256, split="val",
                            augment=False)
        our_res = ours.evaluate_dataset(ds, batch_size=2)

    # pixel-level agreement between the two pipelines' thresholded preds
    import torch

    flips = 0
    total = 0
    prob_stds = []
    with redirect_stdout(sink):
        for i in range(len(ds)):
            img, _ = ds[i]
            t = torch.from_numpy(img).permute(2, 0, 1)[None]
            with torch.no_grad():
                ref_probs = torch.sigmoid(ref_eval.model(t))
                ref_pred = (ref_probs > 0.5).float().squeeze().numpy()
            our_pred = ours.predict_batch(img[None])[1][0, ..., 0]
            flips += int(np.sum(ref_pred != our_pred))
            total += ref_pred.size
            prob_stds.append(float(ref_probs.std()))

    report = {
        "pixel_flips": flips,
        "pixels_total": total,
        # spatial spread of the reference probabilities: evidence the
        # agreement is over a non-degenerate map, not a constant output
        "ref_prob_std": float(np.mean(prob_stds)),
        "metrics": {},
    }
    for k in ("iou", "dice", "accuracy", "precision", "recall", "specificity"):
        report["metrics"][k] = {
            "ref_mean": float(ref_avg[k]),
            "our_mean": float(our_res[f"{k}_mean"]),
            "delta_mean": abs(float(ref_avg[k]) - float(our_res[f"{k}_mean"])),
            "ref_std": float(ref_std[k]),
            "our_std": float(our_res[f"{k}_std"]),
            "delta_std": abs(float(ref_std[k]) - float(our_res[f"{k}_std"])),
        }
    report["max_delta"] = max(
        max(v["delta_mean"], v["delta_std"]) for v in report["metrics"].values()
    )
    return report


def run_cls_parity(workdir: Path, per_class: int = 4, steps: int = 24,
                   batch: int = 8, quiet: bool = True) -> dict:
    workdir = Path(workdir)
    data_root = workdir / "herlev"
    make_herlev_on_disk(data_root, per_class)

    trainer, config = train_reference_cls_stage1(data_root, steps, batch,
                                                 quiet=quiet)
    pth = workdir / "herlev_stage1_best.pth"
    save_reference_cls_checkpoint(trainer, config, pth)

    _, ref_test_herlev = _import_reference_eval()
    sink = io.StringIO() if quiet else sys.stdout
    with redirect_stdout(sink):
        ref_eval = ref_test_herlev.HerlevEvaluator(str(pth), device="cpu")
        ref_res = ref_eval.evaluate_dataset(str(data_root), "test")

    from ugpg_tpu.data.herlev import HerlevDataset
    from ugpg_tpu.eval.herlev import HerlevEvaluator
    from ugpg_tpu.io.torch_import import import_torch_checkpoint

    ckpt_dir = workdir / "imported_herlev_stage1"
    with redirect_stdout(sink):
        import_torch_checkpoint(
            str(pth), task_type="classification", num_classes=7,
            output_dir=str(ckpt_dir),
        )
        ours = HerlevEvaluator(str(ckpt_dir))
        ds = HerlevDataset(str(data_root), image_size=32, split="test",
                           augment=False)
        our_res = ours.evaluate_dataset(ds)

    deltas = {}
    deltas["accuracy"] = abs(float(ref_res["accuracy"]) -
                             float(our_res["accuracy"]))
    ref_rep, our_rep = ref_res["classification_report"], \
        our_res["classification_report"]
    for cname in list(HERLEV_CLASSES) + ["macro avg", "weighted avg"]:
        # our report uses the same sklearn-style keys
        rr = ref_rep[cname]
        orep = our_rep[cname]
        for f in ("precision", "recall", "f1-score", "support"):
            deltas[f"{cname}.{f}"] = abs(float(rr[f]) - float(orep[f]))
    cm_equal = np.array_equal(np.asarray(ref_res["confusion_matrix"]),
                              np.asarray(our_res["confusion_matrix"]))
    for cname in HERLEV_CLASSES:
        rpc = ref_res["per_class_accuracy"].get(cname)
        opc = our_res["per_class_accuracy"].get(cname)
        if rpc is not None and opc is not None:
            deltas[f"per_class_acc.{cname}"] = abs(float(rpc) - float(opc))
    auc_ref = ref_res.get("roc_auc_macro")
    auc_ours = our_res.get("roc_auc")
    if auc_ref is not None and auc_ours is not None:
        deltas["roc_auc_macro"] = abs(float(auc_ref) - float(auc_ours))
    return {
        "confusion_matrix_equal": bool(cm_equal),
        "deltas": deltas,
        "max_delta": max(deltas.values()),
        "ref_accuracy": float(ref_res["accuracy"]),
        "our_accuracy": float(our_res["accuracy"]),
    }


def main(argv=None):
    import argparse
    import tempfile

    import jax

    jax.config.update("jax_platforms", "cpu")  # axon override; local math

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out", default=None)
    p.add_argument("--seg_steps", type=int, default=32)
    p.add_argument("--cls_steps", type=int, default=24)
    p.add_argument("--n_images", type=int, default=6)
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    report = {}
    with tempfile.TemporaryDirectory() as d:
        print("== segmentation (stage-4 .pth import -> eval parity) ==")
        report["segmentation"] = run_seg_parity(
            Path(d), n_images=args.n_images, steps=args.seg_steps,
            quiet=not args.verbose,
        )
        print(json.dumps(report["segmentation"], indent=2))
        print("== classification (Herlev stage-1 .pth import -> eval parity) ==")
        report["classification"] = run_cls_parity(
            Path(d), steps=args.cls_steps, quiet=not args.verbose,
        )
        print(json.dumps(report["classification"], indent=2))

    ok = (report["segmentation"]["max_delta"] <= 1e-5
          and report["classification"]["max_delta"] <= 1e-5
          and report["classification"]["confusion_matrix_equal"])
    report["ok"] = bool(ok)
    print(f"parity_eval: ok={ok} "
          f"(seg max_delta={report['segmentation']['max_delta']:.2e}, "
          f"seg pixel flips={report['segmentation']['pixel_flips']}, "
          f"cls max_delta={report['classification']['max_delta']:.2e})")
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
        print(f"report -> {args.out}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())

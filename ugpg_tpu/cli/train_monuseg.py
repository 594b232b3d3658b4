"""MoNuSeg training CLI (ref: MoNuSegImprove/train_aug_monuseg.py:126-267).

Accepts both the argparse flags the reference defines (--stages --epochs
--batch_size --lr --uncertainty_alpha --resume) AND the --data_dir /
--output_dir flags its README documents but its parser forgot
(ref gap: README.md:63 vs train_aug_monuseg.py:166-173).

Unlike the reference, --resume actually works: existing per-stage best
checkpoints in the output dir are loaded and training restarts at the first
stage without one (the reference parses --resume and never uses it,
ref: train_aug_monuseg.py:172).
"""

from __future__ import annotations

import argparse
import json
import os
from pathlib import Path


def create_config() -> dict:
    return {
        "data_dir": "./data/MoNuSeg",
        "output_dir": "./monuseg_outputs",
        "stages": [1, 2, 3, 4],
        "epochs_per_stage": 50,
        "batch_size": 8,
        "lr": None,  # per-stage defaults (3e-4 / 1e-4)
        "uncertainty_alpha": 1.0,
        "num_workers": 4,
        "resume": False,
    }


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train Uncertainty-Guided Progressive U-Net on MoNuSeg"
    )
    p.add_argument("--data_dir", type=str, help="MoNuSeg dataset root")
    p.add_argument("--output_dir", type=str, help="output directory")
    p.add_argument("--stages", nargs="+", type=int, default=[1, 2, 3, 4])
    p.add_argument("--epochs", type=int, default=50, help="epochs per stage")
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--uncertainty_alpha", type=float, default=1.0)
    p.add_argument("--resume", action="store_true",
                   help="resume from existing stage checkpoints in output_dir "
                        "(mid-stage when _last checkpoints exist)")
    p.add_argument("--checkpoint_every", type=int, default=5,
                   help="write a rolling _last checkpoint every N epochs")
    p.add_argument("--bf16", action="store_true",
                   help="bfloat16 compute (TPU fast path)")
    p.add_argument("--plain", action="store_true",
                   help="use the raw MoNuSegDataset instead of aug patches")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="shard over a (data, model) device mesh, e.g. "
                        "'4,2' for 4-way data x 2-way tensor parallel; "
                        "'auto' = all devices data-parallel")
    p.add_argument("--checkpoint_backend", default="msgpack",
                   choices=["msgpack", "orbax", "orbax-async"],
                   help="checkpoint storage backend (orbax-async saves "
                        "without blocking the train loop)")
    p.add_argument("--scan_epochs", action="store_true",
                   help="fuse each epoch into one lax.scan program (one "
                        "dispatch + one metric fetch per epoch; same "
                        "trajectory as the per-step path)")
    p.add_argument("--tb_logdir", type=str, default=None,
                   help="write per-epoch TensorBoard scalars to this dir")
    p.add_argument("--native_finetune", type=int, default=0, metavar="EPOCHS",
                   help="after progressive training, fine-tune the last "
                        "requested stage at NATIVE slide resolution, "
                        "spatially sharded over --mesh (H over 'data'; add "
                        "--native_w_axis to shard W over 'model' too)")
    p.add_argument("--native_size", type=int, default=1000,
                   help="dataset resolution for the native fine-tune phase "
                        "(default 1000 = MoNuSeg full TIFF resolution)")
    p.add_argument("--native_w_axis", action="store_true",
                   help="2-D spatial grid for --native_finetune: W sharded "
                        "over the 'model' mesh axis")
    p.add_argument("--scan_chunk_mb", type=int, default=1024,
                   help="cap (MiB) on the per-dispatch stacked-epoch size "
                        "under --scan_epochs; oversized epochs run as "
                        "several scan programs (0 = unbounded)")
    p.add_argument("--accum_steps", type=int, default=1, metavar="K",
                   help="gradient accumulation: run each batch (size K*m) "
                        "as K sequential micro-batches inside one program "
                        "with ONE optimizer update — for effective batch "
                        "sizes whose activations exceed HBM. Applies to "
                        "the stage-pyramid phase only; the "
                        "--native_finetune phase trains batch-1 whole "
                        "slides (spatial grid = the memory axis)")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize every DoubleConv in the backward "
                        "pass (jax.checkpoint): block activations are "
                        "recomputed instead of stored — lower peak "
                        "activation memory for ~1 extra forward of FLOPs. "
                        "Identical gradients; pairs well with "
                        "--native_finetune / large --batch_size")
    p.add_argument("--pipeline_unc", type=int, default=0, metavar="N",
                   help="pipeline parallelism: dedicate the last N devices "
                        "to the frozen previous-stage uncertainty forward "
                        "(its own program, dispatched one batch ahead); "
                        "the rest train data-parallel. Stages > 1 only; "
                        "exclusive with --mesh; composes with "
                        "--scan_epochs (chunk-level pipelining) and "
                        "--accum_steps")
    p.add_argument("--aug_quantize", type=int, default=0, metavar="N",
                   help="opt-in: quantize the augmentation rotation to N "
                        "discrete angles on the MXU shear path "
                        "(ops/rotate.py) instead of the per-sample gather")
    return p


def parse_mesh(spec: str | None):
    """'DATA[,MODEL]' / 'auto' -> jax.sharding.Mesh (None -> single device).

    Shared by every CLI that takes a --mesh flag (train, test, serve) so the
    grammar stays uniform and multi-host runs always go through
    ``parallel.distributed.initialize``."""
    if not spec:
        return None
    from ugpg_tpu.parallel.distributed import initialize
    from ugpg_tpu.parallel.mesh import make_mesh

    initialize()  # no-op unless a coordinator is configured (multi-host)
    if spec == "auto":
        return make_mesh()
    parts = [int(x) for x in spec.split(",")]
    if len(parts) == 1:
        parts.append(1)
    if len(parts) != 2:
        raise SystemExit(f"--mesh expects DATA[,MODEL] or 'auto', got {spec!r}")
    return make_mesh(n_data=parts[0], n_model=parts[1])


def main(argv=None):
    args = build_argparser().parse_args(argv)
    config = create_config()
    for key, val in (
        ("data_dir", args.data_dir),
        ("output_dir", args.output_dir),
        ("lr", args.lr),
    ):
        if val is not None:
            config[key] = val
    config.update(
        stages=args.stages,
        epochs_per_stage=args.epochs,
        batch_size=args.batch_size,
        uncertainty_alpha=args.uncertainty_alpha,
        resume=args.resume,
    )

    import jax.numpy as jnp

    from ugpg_tpu.data.monuseg import MoNuSegDataset, create_train_val_split
    from ugpg_tpu.train.aug_trainer import AugMoNuSegTrainer, compute_pos_weight

    trainer = AugMoNuSegTrainer(
        config, dtype=jnp.bfloat16 if args.bf16 else None,
        mesh=parse_mesh(args.mesh),
        checkpoint_backend=args.checkpoint_backend,
        scan_epochs=args.scan_epochs,
        scan_chunk_bytes=(args.scan_chunk_mb << 20) or None,
        tb_logdir=args.tb_logdir,
        accum_steps=args.accum_steps,
        remat=args.remat,
        pipeline_unc=args.pipeline_unc,
        aug_quantize=args.aug_quantize,
    )

    if args.plain:
        data_dir = config["data_dir"]
        if not os.path.isdir(os.path.join(data_dir, "val")):
            create_train_val_split(data_dir, val_ratio=0.2, seed=42)
        for stage in config["stages"]:
            res = trainer.stage_configs[stage]["resolution"]
            trainer.train_datasets[stage] = MoNuSegDataset(
                data_dir, image_size=res, split="train", augment=True
            )
            trainer.val_datasets[stage] = MoNuSegDataset(
                data_dir, image_size=res, split="val", augment=False
            )
        pw = compute_pos_weight(trainer.train_datasets[config["stages"][0]])
        trainer.pos_weight = jnp.asarray(pw, jnp.float32)
        print(f"Auto-computed pos_weight: {pw:.4f}")
    else:
        trainer.setup_datasets(config["data_dir"], stages=tuple(config["stages"]))

    train_loaders, val_loaders = trainer.make_loaders(
        batch_size=config["batch_size"], num_workers=config["num_workers"]
    )

    stages = list(config["stages"])
    if config["resume"]:
        # stage-granularity resume for runs that only have _best checkpoints;
        # mid-stage resume (from _last) is handled inside train_progressive.
        from ugpg_tpu.io.checkpoint import has_checkpoint

        out = Path(config["output_dir"])
        for stage in list(stages):
            best = out / f"ug_pgunet_stage{stage}_best"
            last = out / f"ug_pgunet_stage{stage}_last"
            if has_checkpoint(best) and not has_checkpoint(last):
                trainer.load_stage_weights(stage, best)
                stages.remove(stage)
                print(f"Resume: stage {stage} restored from {best}")
            else:
                break
        if not stages:
            # nothing progressive left to do — but a requested
            # --native_finetune phase must still run below
            print("Resume: all requested stages already trained")

    interrupted = False
    if stages:
        from ugpg_tpu.utils.preemption import PreemptionGuard

        try:
            # SIGTERM (Cloud TPU maintenance / scheduler eviction) ->
            # rolling checkpoint + early return; __main__ exits 75
            # (EX_TEMPFAIL) so schedulers requeue with --resume
            with PreemptionGuard() as guard:
                trainer.train_progressive(
                    train_loaders,
                    val_loaders,
                    save_dir=config["output_dir"],
                    stages=stages,
                    checkpoint_every=args.checkpoint_every,
                    resume=config["resume"],
                    preemption=guard,
                )
        except KeyboardInterrupt:
            interrupted = True
            print("Training interrupted by user")
        interrupted = interrupted or getattr(trainer, "preempted", False)

    if args.native_finetune and interrupted:
        print("Skipping --native_finetune after interrupt")
    if args.native_finetune and not interrupted:
        if trainer.mesh is None:
            raise SystemExit("--native_finetune requires --mesh")
        from ugpg_tpu.data.loader import DataLoader

        stage = max(config["stages"])
        # whole slides: batch 1 per step — the spatial grid, not the batch
        # axis, provides the parallelism at native resolution
        ft_train = DataLoader(
            MoNuSegDataset(config["data_dir"], image_size=args.native_size,
                           split="train", augment=False),
            batch_size=1, shuffle=True, seed=0,
        )
        ft_val = DataLoader(
            MoNuSegDataset(config["data_dir"], image_size=args.native_size,
                           split="val", augment=False),
            batch_size=1,
        )
        trainer.finetune_native(
            ft_train, stage=stage, epochs=args.native_finetune,
            w_axis="model" if args.native_w_axis else None,
            val_loader=ft_val, save_dir=config["output_dir"],
        )

    cfg_path = Path(config["output_dir"]) / "config.json"
    cfg_path.parent.mkdir(parents=True, exist_ok=True)
    cfg_path.write_text(json.dumps(config, indent=2, default=str))
    return trainer


def cli(argv=None) -> int:
    """Console-script entry: translate preemption into exit 75 (EX_TEMPFAIL).

    ``main`` returns the trainer (tests use it); the packaged
    ``ugpg-train-monuseg`` script and ``python -m``/direct invocation must
    all surface the scheduler-facing exit-code contract, so they route
    through here instead of ``sys.exit(main())``-ing the trainer object.
    """
    trainer = main(argv)
    # 75 = EX_TEMPFAIL: tell schedulers to requeue the (resumable) job
    return 75 if getattr(trainer, "preempted", False) else 0


if __name__ == "__main__":
    import sys

    sys.exit(cli())

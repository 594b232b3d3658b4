"""Herlev classification training CLI (ref: Herlev/train_herlev.py:592-653)."""

from __future__ import annotations

import argparse
import json
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Train Progressive U-Net for Herlev cervical-cell "
        "classification"
    )
    p.add_argument("--stages", nargs="+", type=int, default=[1, 2, 3, 4])
    p.add_argument("--epochs", type=int, default=30)
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--binary", action="store_true",
                   help="binary normal/abnormal classification")
    p.add_argument("--uncertainty_alpha", type=float, default=1.0)
    p.add_argument("--data_dir", type=str, required=False)
    p.add_argument("--output_dir", type=str, default="./herlev_outputs")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--mesh", type=str, default=None, metavar="DATA,MODEL",
                   help="shard over a (data, model) device mesh "
                        "(e.g. '4,2'; 'auto' = all devices data-parallel)")
    p.add_argument("--checkpoint_backend", default="msgpack",
                   choices=["msgpack", "orbax", "orbax-async"])
    p.add_argument("--scan_epochs", action="store_true",
                   help="fuse each epoch into one lax.scan program (one "
                        "dispatch + one metric fetch per epoch; same "
                        "trajectory as the per-step path)")
    p.add_argument("--tb_logdir", type=str, default=None,
                   help="write per-epoch TensorBoard scalars to this dir")
    p.add_argument("--scan_chunk_mb", type=int, default=1024,
                   help="cap (MiB) on the per-dispatch stacked-epoch size "
                        "under --scan_epochs; oversized epochs run as "
                        "several scan programs (0 = unbounded)")
    p.add_argument("--accum_steps", type=int, default=1, metavar="K",
                   help="gradient accumulation: run each batch (size K*m) "
                        "as K sequential micro-batches inside one program "
                        "with ONE optimizer update")
    p.add_argument("--remat", action="store_true",
                   help="rematerialize encoder DoubleConvs in the backward "
                        "pass (jax.checkpoint): recompute activations "
                        "instead of storing them — lower peak memory, "
                        "identical gradients")
    p.add_argument("--pipeline_unc", type=int, default=0, metavar="N",
                   help="pipeline parallelism: dedicate the last N devices "
                        "to the frozen previous-stage uncertainty forward "
                        "(its own program, dispatched one batch ahead); "
                        "the rest train data-parallel. Stages > 1 only; "
                        "exclusive with --mesh; composes with "
                        "--scan_epochs (chunk-level pipelining) and "
                        "--accum_steps. Train loaders drop the ragged "
                        "final batch (batch sizes must divide both device "
                        "groups)")
    p.add_argument("--resume", action="store_true",
                   help="resume mid-stage from the herlev_stage{S}_last "
                        "checkpoint a preempted run wrote in output_dir "
                        "(optimizer/scheduler/early-stopping state included)")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    import jax.numpy as jnp

    from ugpg_tpu.data.herlev import HerlevDataset
    from ugpg_tpu.data.loader import DataLoader
    from ugpg_tpu.models.classifier import CLS_STAGE_RESOLUTIONS
    from ugpg_tpu.train.cls_trainer import HerlevTrainer, create_config

    config = create_config()
    config.update(
        stages=args.stages,
        epochs_per_stage=args.epochs,
        batch_size=args.batch_size,
        binary_classification=args.binary,
        uncertainty_alpha=args.uncertainty_alpha,
        output_dir=args.output_dir,
        scan_epochs=args.scan_epochs,
        scan_chunk_bytes=(args.scan_chunk_mb << 20) or None,
        tb_logdir=args.tb_logdir,
        accum_steps=args.accum_steps,
        remat=args.remat,
        pipeline_unc=args.pipeline_unc,
    )
    if args.data_dir:
        config["data_dir"] = args.data_dir
    if config["binary_classification"]:
        config["num_classes"] = 2
    if not config["data_dir"]:
        raise SystemExit("--data_dir is required")

    print("=== Herlev Cervical Cell Classification Training ===")
    print(f"Classes: {config['num_classes']}  Stages: {config['stages']}  "
          f"Epochs/stage: {config['epochs_per_stage']}")

    # per-stage datasets at each stage resolution (ref: :551-589)
    train_loaders, val_loaders = {}, {}
    class_weights = None
    for stage in range(1, 5):
        size = CLS_STAGE_RESOLUTIONS[stage]
        tr_ds = HerlevDataset(
            config["data_dir"], image_size=size, split="train",
            augment=True,
            binary_classification=config["binary_classification"],
            target_split_ratio=config["split_ratios"], verbose=(stage == 1),
        )
        va_ds = HerlevDataset(
            config["data_dir"], image_size=size, split="val", augment=False,
            binary_classification=config["binary_classification"],
            target_split_ratio=config["split_ratios"], verbose=False,
        )
        train_loaders[stage] = DataLoader(
            tr_ds, batch_size=config["batch_size"], shuffle=True,
            num_workers=config["num_workers"], seed=42 + stage,
            # the pipelined epoch needs every batch to divide both device
            # groups; drop the ragged tail instead of erroring mid-epoch
            drop_last=bool(args.pipeline_unc),
        )
        val_loaders[stage] = DataLoader(
            va_ds, batch_size=config["batch_size"],
            num_workers=config["num_workers"],
        )
        if class_weights is None:
            class_weights = tr_ds.get_class_weights().tolist()

    if config.get("class_weights") is None:
        config["class_weights"] = class_weights
        print(f"Computed class weights: {[round(w, 3) for w in class_weights]}")

    from ugpg_tpu.cli.train_monuseg import parse_mesh

    trainer = HerlevTrainer(config, dtype=jnp.bfloat16 if args.bf16 else None,
                            mesh=parse_mesh(args.mesh),
                            checkpoint_backend=args.checkpoint_backend)
    try:
        from ugpg_tpu.utils.preemption import PreemptionGuard

        # SIGTERM -> herlev_stage{S}_last checkpoint + early return;
        # __main__ exits 75 (EX_TEMPFAIL) so schedulers requeue
        with PreemptionGuard() as guard:
            trainer.train_progressive(
                train_loaders, val_loaders, config["output_dir"],
                preemption=guard, resume=args.resume,
            )
        cfg_path = os.path.join(config["output_dir"], "config.json")
        with open(cfg_path, "w") as f:
            json.dump(config, f, indent=2, default=str)
        print(f"Configuration saved to: {cfg_path}")
    except KeyboardInterrupt:
        print("Training interrupted by user")
    return trainer


def cli(argv=None) -> int:
    """Console-script entry: preemption -> exit 75 (see train_monuseg.cli)."""
    trainer = main(argv)
    return 75 if getattr(trainer, "preempted", False) else 0


if __name__ == "__main__":
    import sys

    sys.exit(cli())

"""Import a reference PyTorch .pth checkpoint into a native checkpoint.

Usage:
    python -m ugpg_tpu.cli.import_torch --pth ug_pgunet_stage4_best.pth \
        --out imported/stage4 [--stage 4] [--task segmentation] [--classes 1]

The stage is sniffed from the checkpoint dict when present (raw state dicts
are assumed stage 4, matching the reference loader's behavior,
ref: test_monuseg.py:124-162).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Import a torch .pth checkpoint")
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--stage", type=int, default=None)
    p.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation")
    p.add_argument("--classes", type=int, default=None)
    args = p.parse_args(argv)

    from ugpg_tpu.io.torch_import import import_torch_checkpoint

    num_classes = args.classes or (1 if args.task == "segmentation" else 7)
    variables, stage = import_torch_checkpoint(
        args.pth,
        stage=args.stage,
        num_classes=num_classes,
        task_type=args.task,
        output_dir=args.out,
    )
    return stage


if __name__ == "__main__":
    main()

"""Export a native checkpoint as a reference-loadable PyTorch .pth.

Usage:
    python -m ugpg_tpu.cli.export_torch --ckpt outputs/ug_pgunet_stage4_best \
        --out ug_pgunet_stage4_best.pth [--stage 4] [--task segmentation] \
        [--raw]

The produced .pth loads in the reference eval CLIs unchanged
(strict ``load_state_dict``; ref: test_monuseg.py:120-162,
test_herlev.py:74-102).  ``--raw`` writes a bare state dict (the reference
segmentation loader then assumes stage 4).
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Export a torch .pth checkpoint")
    p.add_argument("--ckpt", required=True, help="native checkpoint directory")
    p.add_argument("--out", required=True, help="output .pth path")
    p.add_argument("--stage", type=int, default=None,
                   help="override the stage recorded in the checkpoint")
    p.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation")
    p.add_argument("--raw", action="store_true",
                   help="save a bare state dict instead of a checkpoint dict")
    args = p.parse_args(argv)

    from ugpg_tpu.io.torch_export import export_torch_checkpoint

    export_torch_checkpoint(
        args.ckpt,
        args.out,
        task_type=args.task,
        stage=args.stage,
        raw_state_dict=args.raw,
    )
    return 0


def cli():
    raise SystemExit(main())


if __name__ == "__main__":
    cli()

"""Export a checkpoint as a self-contained StableHLO serving artifact.

Usage:
    python -m ugpg_tpu.cli.export_model --model out/ug_pgunet_stage4_best \
        --out exported/stage4 [--buckets 1 8 128] [--task segmentation] \
        [--classes 1] [--uint8] [--platforms cpu tpu]

The artifact directory (one versioned StableHLO module per batch bucket,
weights baked in, plus manifest.json) serves with NO model code or
checkpoint via ``ugpg_tpu.eval.serving.ExportedPredictor`` — on any
platform listed in ``--platforms``, regardless of the exporting host.
The reference has no deployment story beyond pickled .pth files
(ref: uncertainty_guided_trainer.py:382-393); this is the TPU-native one.
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(
        description="Export a checkpoint as a StableHLO serving artifact"
    )
    p.add_argument("--model", required=True, help="checkpoint path")
    p.add_argument("--out", required=True, help="artifact output directory")
    p.add_argument("--buckets", type=int, nargs="+", default=[1, 8, 64])
    p.add_argument("--task", choices=["segmentation", "classification"],
                   default="segmentation")
    p.add_argument("--classes", type=int, default=None)
    p.add_argument("--uint8", action="store_true",
                   help="compile for raw uint8 RGB requests (device /255)")
    p.add_argument("--compact", action="store_true",
                   help="uint8 preds + float16 maps (2.4x fewer bytes)")
    p.add_argument("--quantize", action="store_true",
                   help="export the W8A8 int8 path (requires --calibration)")
    p.add_argument("--calibration", type=str, default=None, metavar="NPY",
                   help=".npy file of (N, H, W, 3) float images from the "
                        "REAL input distribution — activation calibration "
                        "for --quantize")
    p.add_argument("--platforms", nargs="+", default=["cpu", "tpu"])
    args = p.parse_args(argv)

    import numpy as np

    import jax.numpy as jnp

    from ugpg_tpu.eval.serving import Predictor

    calibration_batches = None
    if args.quantize:
        if args.calibration is None:
            raise SystemExit("--quantize requires --calibration NPY "
                             "(no silent random calibration)")
        calibration_batches = [np.load(args.calibration)]

    num_classes = args.classes or (1 if args.task == "segmentation" else 7)
    predictor = Predictor(
        args.model,
        task_type=args.task,
        num_classes=num_classes,
        buckets=tuple(args.buckets),
        input_dtype=jnp.uint8 if args.uint8 else jnp.float32,
        compact_output=args.compact,
        quantize=args.quantize,
        calibration_batches=calibration_batches,
        dtype=None,  # export in the checkpoint's precision (f32)
    )
    path = predictor.export(args.out, platforms=tuple(args.platforms))
    print(f"exported stage-{predictor.stage} {args.task} artifact to {path} "
          f"(buckets {predictor.buckets}, platforms {args.platforms})")
    return path


if __name__ == "__main__":
    main()

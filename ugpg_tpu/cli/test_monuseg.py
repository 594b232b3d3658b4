"""MoNuSeg evaluation/inference CLI (ref: MoNuSegImprove/test_monuseg.py:395-501)."""

from __future__ import annotations

import argparse
import os


def resolve_dataset_path(data_arg: str | None) -> str | None:
    """Dataset path auto-resolution (ref: test_monuseg.py:424-440)."""
    candidates = [
        data_arg,
        "./data/MoNuSeg",
        "./MoNuSeg",
        "../data/MoNuSeg",
        os.path.expanduser("~/data/MoNuSeg"),
    ]
    for cand in candidates:
        if cand and os.path.isdir(os.path.join(cand, "val")):
            return cand
        if cand and os.path.isdir(os.path.join(cand, "train")):
            return cand
    return None


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Evaluate / run inference with a "
                                "trained UG-PG-UNet on MoNuSeg")
    p.add_argument("--model", required=True, help="checkpoint directory")
    p.add_argument("--data", type=str, default=None, help="MoNuSeg root")
    p.add_argument("--split", type=str, default="val")
    p.add_argument("--num_images", type=int, default=3,
                   help="random images to visualize")
    p.add_argument("--infer", type=str, default=None, help="single image path")
    p.add_argument("--infer_dir", type=str, default=None, help="directory of images")
    p.add_argument("--eval_full", action="store_true",
                   help="run full-dataset evaluation and dump JSON")
    p.add_argument("--save_uncertainty", action="store_true",
                   help="also write *_unc.png uncertainty heatmaps for the "
                        "visualized images")
    p.add_argument("--native_res", action="store_true",
                   help="with --eval_full: evaluate at NATIVE slide "
                        "resolution (pad + convolutional full-res forward, "
                        "no downsize-to-stage-res) instead of the "
                        "reference's <=256px eval; combine with --mesh to "
                        "shard the slide spatially across devices")
    p.add_argument("--mesh", type=str, default=None, metavar="H[,W]",
                   help="spatial shard grid for --native_res: H-way over "
                        "'data' (and optionally W-way over 'model'), e.g. "
                        "'4' or '4,2'; 'auto' = all devices H-way")
    p.add_argument("--output_dir", type=str, default="./test_results")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator, MoNuSegInferer

    results = {}
    if args.infer or args.infer_dir:
        inferer = MoNuSegInferer(args.model)
        if args.infer:
            inferer.infer_image(args.infer, args.output_dir)
        if args.infer_dir:
            results["inference"] = inferer.infer_directory(
                args.infer_dir, args.output_dir
            )
        if not (args.data or args.eval_full):
            return results

    evaluator = MoNuSegEvaluator(args.model)
    data_dir = resolve_dataset_path(args.data)
    if data_dir is None:
        print("No dataset found; nothing to evaluate "
              "(use --data or --infer/--infer_dir)")
        return results

    from ugpg_tpu.data.monuseg import MoNuSegDataset

    dataset = MoNuSegDataset(
        data_dir,
        image_size=evaluator.resolution,
        split=args.split,
        augment=False,
    )
    if args.num_images:
        written = evaluator.test_random_images(
            dataset, num_images=args.num_images, output_dir=args.output_dir
        )
        results["visualizations"] = written
        if args.save_uncertainty:
            import numpy as np
            from PIL import Image

            rng = np.random.default_rng(42)
            idxs = rng.choice(len(dataset),
                              size=min(args.num_images, len(dataset)),
                              replace=False)
            for idx in idxs:
                image, _ = dataset[int(idx)]
                _, _, unc = evaluator.predict_image(image, return_uncertainty=True)
                heat = (np.clip(unc, 0, 1) * 255).astype("uint8")
                Image.fromarray(heat).save(
                    os.path.join(args.output_dir, f"uncertainty_{idx}.png")
                )
    if args.eval_full:
        if args.native_res:
            mesh = None
            w_axis = None
            if args.mesh:
                from ugpg_tpu.parallel.mesh import make_mesh

                if args.mesh == "auto":
                    import jax

                    mesh = make_mesh(n_data=len(jax.devices()), n_model=1)
                else:
                    parts = [int(v) for v in args.mesh.split(",")]
                    n_h, n_w = (parts + [1])[:2]
                    mesh = make_mesh(n_data=n_h, n_model=n_w)
                    w_axis = "model" if n_w > 1 else None
            results["metrics"] = evaluator.evaluate_dataset_native(
                dataset, mesh=mesh, w_axis=w_axis,
                output_file=os.path.join(
                    args.output_dir, "evaluation_results_native.json"
                ),
            )
        else:
            results["metrics"] = evaluator.evaluate_dataset(
                dataset,
                output_file=os.path.join(args.output_dir, "evaluation_results.json"),
            )
        print("Evaluation:", {k: round(v, 4) for k, v in results["metrics"].items()
                              if isinstance(v, float)})
    return results


if __name__ == "__main__":
    main()

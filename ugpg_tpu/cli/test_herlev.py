"""Herlev classification evaluation CLI (ref: Herlev/test_herlev.py:608-683)."""

from __future__ import annotations

import argparse
import json
import os


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="Evaluate a trained Herlev classification model"
    )
    p.add_argument("--model", required=True, help="checkpoint directory")
    p.add_argument("--data_dir", required=True, help="Herlev dataset root")
    p.add_argument("--split", default="test")
    p.add_argument("--batch_size", type=int, default=16)
    p.add_argument("--output_dir", default="./herlev_test_results")
    p.add_argument("--num_samples", type=int, default=16,
                   help="sample-prediction grid size")
    p.add_argument("--predict", type=str, default=None,
                   help="classify a single image instead of a dataset")
    return p


def main(argv=None):
    args = build_argparser().parse_args(argv)

    from ugpg_tpu.eval.herlev import HerlevEvaluator

    evaluator = HerlevEvaluator(args.model)

    if args.predict:
        pred, name, probs = evaluator.predict_single(args.predict)
        print(f"{args.predict}: {name} "
              f"(class {pred}, p={probs[pred]:.4f})")
        return {"prediction": name, "probs": probs.tolist()}

    from ugpg_tpu.data.herlev import HerlevDataset

    dataset = HerlevDataset(
        args.data_dir,
        image_size=evaluator.resolution,
        split=args.split,
        augment=False,
        binary_classification=evaluator.binary,
        verbose=False,
    )
    results = evaluator.evaluate_dataset(
        dataset, batch_size=args.batch_size, output_dir=args.output_dir
    )
    evaluator.plot_sample_predictions(
        dataset,
        os.path.join(args.output_dir, "sample_predictions.png"),
        num_samples=args.num_samples,
    )
    print(f"Accuracy: {results['accuracy']:.4f}  "
          f"ROC-AUC: {results['roc_auc']:.4f}")
    print(json.dumps(results["classification_report"]["weighted avg"], indent=2))
    return results


if __name__ == "__main__":
    main()

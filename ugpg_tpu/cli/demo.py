"""Runnable demos / smoke tests (ref: demo_uncertainty_guided.py).

Three demos on synthetic data, no dataset download needed:
1. uncertainty-map generation with shape/range checks (ref: :89-152)
2. alpha-sweep impact table over {0, .5, 1, 2, 5} (ref: :155-201)
3. mini 4-stage progressive training run on DummyDataset (ref: :39-86)

(The reference's demo imports from a parent package that doesn't exist
in-repo — ref: demo_uncertainty_guided.py:15-16 — so it cannot actually run;
this one does.)
"""

from __future__ import annotations

import argparse

import numpy as np


def demo_uncertainty_maps():
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.models.pgunet import PGUNet1
    from ugpg_tpu.uncertainty import generate_uncertainty_map

    print("=" * 60)
    print("Demo 1: uncertainty map generation")
    module = PGUNet1(num_classes=1)
    variables = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    x = jnp.asarray(np.random.default_rng(0).random((2, 64, 64, 3)), jnp.float32)
    amap = generate_uncertainty_map(
        lambda xp: module.apply(variables, xp, False), x, 32, 64
    )
    print(f"  input {x.shape} -> uncertainty {amap.shape}")
    print(f"  range [{float(amap.min()):.4f}, {float(amap.max()):.4f}], "
          f"mean {float(amap.mean()):.4f}")
    assert amap.shape == (2, 64, 64, 1)
    assert 0.0 <= float(amap.min()) and float(amap.max()) <= 1.0
    print("  OK: shape and [0,1] range verified")
    return amap


def demo_alpha_sweep():
    import jax.numpy as jnp

    from ugpg_tpu.uncertainty import apply_uncertainty_weighted_loss

    print("=" * 60)
    print("Demo 2: alpha sweep (uncertainty weighting impact)")
    rng = np.random.default_rng(1)
    pixel_loss = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    amap = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    base = float(jnp.mean(pixel_loss))
    print(f"  {'alpha':>6} {'weighted':>10} {'increase':>9}")
    rows = []
    for alpha in (0.0, 0.5, 1.0, 2.0, 5.0):
        final, _ = apply_uncertainty_weighted_loss(pixel_loss, amap, alpha)
        inc = float(final) / base - 1.0
        print(f"  {alpha:>6.1f} {float(final):>10.4f} {inc:>8.1%}")
        rows.append((alpha, float(final)))
    assert all(b[1] >= a[1] for a, b in zip(rows, rows[1:]))
    print("  OK: loss grows monotonically with alpha")
    return rows


def demo_mini_progressive_train(epochs: int = 2, stages: int = 2):
    from ugpg_tpu.data.synthetic import ArrayLoader, disk_dataset
    from ugpg_tpu.train.seg_trainer import UncertaintyGuidedProgressiveTrainer

    print("=" * 60)
    print(f"Demo 3: mini progressive training ({stages} stages x {epochs} epochs)")
    images, masks = disk_dataset(num_samples=16, image_size=64, seed=2)
    train = ArrayLoader(images[:12], masks[:12], batch_size=4, shuffle=True)
    val = ArrayLoader(images[12:], masks[12:], batch_size=4)
    cfgs = {
        s: {"resolution": r, "epochs_per_stage": epochs,
            "lr": 3e-4 if s == 1 else 1e-4}
        for s, r in {1: 32, 2: 64, 3: 128, 4: 256}.items()
    }
    trainer = UncertaintyGuidedProgressiveTrainer(stage_configs=cfgs, verbose=False)
    history = trainer.train_progressive(
        train, val, max_stages=stages, save_dir="./demo_outputs"
    )
    for i, (tl, td) in enumerate(zip(history["train_loss"], history["train_dice"])):
        print(f"  epoch {i}: loss {tl:.4f}, dice {td:.4f}")
    print("  OK: progressive training completed")
    return history


def main(argv=None):
    p = argparse.ArgumentParser(description="UG-PG-UNet TPU demos")
    p.add_argument("--demo", choices=["uncertainty", "alpha", "train", "all"],
                   default="all")
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--stages", type=int, default=2)
    args = p.parse_args(argv)

    if args.demo in ("uncertainty", "all"):
        demo_uncertainty_maps()
    if args.demo in ("alpha", "all"):
        demo_alpha_sweep()
    if args.demo in ("train", "all"):
        demo_mini_progressive_train(args.epochs, args.stages)
    print("=" * 60)
    print("All demos completed.")


if __name__ == "__main__":
    main()

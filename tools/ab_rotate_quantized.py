"""A/B: augmentation rotation — per-sample gather vs angle-quantized paths.

Measures, on the live backend (TPU via the axon tunnel; CPU for harness
dev), the stage-4-shaped rotation in isolation and the full config-5 train
step (bench.py::bench_config5 shape: PGUNet4 bf16, 256px, augment on):

  A. stock ``random_rotate`` — continuous per-sample angle, bilinear GATHER
     (the path BASELINE.md §On-device augmentation measured at ~234 ms per
     64-batch on v5e)
  B. ``random_rotate_quantized(use_gather=True)`` — N constant-angle
     gathers + select (constant sample coordinates)
  C. ``random_rotate_quantized`` shears — N constant-angle Paeth
     three-shear einsums + select (MXU path, ops/rotate.py)

and the end-to-end step with ``aug_quantize=0`` vs ``N``.  Emits one JSON
report; run with --trace to also capture a jax.profiler trace of the two
train-step variants (the train-step roofline artifact, VERDICT r4 weak #3).

Run on the TPU:  python tools/ab_rotate_quantized.py --out /tmp/ab_rot.json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _time_fn(fn, iters: int = 20, warmup: int = 3) -> float:
    """Median ms/call; fn must block (call .block_until_ready inside)."""
    for _ in range(warmup):
        fn()
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) * 1e3)
    return float(np.median(times))


def bench_rotation(jax, jnp, batch: int, res: int, n_angles: int):
    import functools

    from ugpg_tpu.data.augment import random_rotate
    from ugpg_tpu.ops.rotate import random_rotate_quantized

    rng = np.random.default_rng(0)
    imgs = jnp.asarray(rng.random((batch, res, res, 3), dtype=np.float32))
    masks = jnp.asarray(
        (rng.random((batch, res, res, 1)) > 0.7).astype(np.float32)
    )
    key = jax.random.key(0)

    stock = jax.jit(lambda k, i, m: random_rotate(k, i, m, max_deg=90.0))
    quant_shear = functools.partial(
        random_rotate_quantized, max_deg=90.0, n_angles=n_angles,
        use_gather=False,
    )
    quant_gather = functools.partial(
        random_rotate_quantized, max_deg=90.0, n_angles=n_angles,
        use_gather=True,
    )

    chain = 16
    out = {}
    for name, fn in (("stock_gather", stock),
                     ("quantized_const_gather", quant_gather),
                     ("quantized_shear_einsum", quant_shear)):
        def run(fn=fn):
            # dependent chain: each call consumes the previous output, so
            # async dispatch (and the tunnel's deferred readiness) cannot
            # hide the device time; report per-call ms
            i, m = imgs, masks
            for _ in range(chain):
                i, m = fn(key, i, m)
            i.block_until_ready()

        out[name + "_ms"] = round(_time_fn(run, iters=8) / chain, 3)
    out["batch"], out["res"], out["n_angles"] = batch, res, n_angles
    return out


def _make_step(jax, jnp, aug_quantize: int):
    from ugpg_tpu.models.pgunet import PGUNet4
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    module = PGUNet4(num_classes=1, dtype=jnp.bfloat16)
    variables = module.init(
        jax.random.key(0), jnp.zeros((1, 256, 256, 3)), False
    )
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    step = make_seg_train_step(
        module, tx, 4, 256, donate=False, augment=True, fused_loss=False,
        aug_quantize=aug_quantize,
    )
    return step, TrainState.create(variables, tx), tx


def bench_train_step(jax, jnp, batch: int, n_angles: int, trace_dir=None):
    """config-5-shaped step img/s, stock vs quantized augmentation."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 256, 256, 3), dtype=np.float32))
    y = jnp.asarray((rng.random((batch, 256, 256, 1)) > 0.7).astype(np.float32))
    pw = jnp.asarray(5.0)
    out = {}
    for name, q in (("stock", 0), ("quantized", n_angles)):
        step, state, _ = _make_step(jax, jnp, q)

        def run():
            nonlocal state
            s = state
            m = None
            for i in range(4):
                s, m = step(s, {}, (x, y), pw, jax.random.key(i))
            jax.block_until_ready(m["final_loss"])

        ms = _time_fn(run, iters=10) / 4.0
        out[f"{name}_step_ms"] = round(ms, 3)
        out[f"{name}_img_per_s"] = round(batch / (ms / 1e3), 2)
        if trace_dir:
            d = Path(trace_dir) / name
            d.mkdir(parents=True, exist_ok=True)
            with jax.profiler.trace(str(d)):
                run()
            out[f"{name}_trace"] = str(d)
    out["speedup"] = round(
        out["quantized_img_per_s"] / out["stock_img_per_s"], 3
    )
    out["train_batch"] = batch
    return out


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--train_batch", type=int, default=16)
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--n_angles", type=int, default=15)
    p.add_argument("--out", default=None)
    p.add_argument("--trace", default=None, metavar="DIR",
                   help="also capture jax.profiler traces of both train "
                        "steps under DIR (train-step roofline artifact)")
    p.add_argument("--cpu", action="store_true",
                   help="force the local CPU backend (harness dev only)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    report = {"device": str(dev), "platform": dev.platform}
    report["rotation_only"] = bench_rotation(
        jax, jnp, args.batch, args.res, args.n_angles
    )
    print(json.dumps(report["rotation_only"]))
    report["train_step"] = bench_train_step(
        jax, jnp, args.train_batch, args.n_angles, trace_dir=args.trace
    )
    print(json.dumps(report["train_step"]))
    if args.out:
        Path(args.out).write_text(json.dumps(report, indent=2))
        print(f"report -> {args.out}")


if __name__ == "__main__":
    main()

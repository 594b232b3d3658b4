"""A/B: activation rematerialization (``remat=True``) on the real backend.

Measures, for the REAL stage-4 uncertainty-guided train step
(``make_seg_train_step``: stage-3 frozen forward + stage-4 fwd/bwd + RMSprop
update in one program), plain vs remat:

* XLA's compiled-program memory analysis (temp/activation bytes) — the
  quantity remat exists to shrink;
* step wall time (chained-barrier timing like bench.py: each step consumes
  the previous step's state, so remote execution caching cannot serve
  repeats) — the FLOPs cost remat pays.

NOTE: this is only meaningful on TPU.  XLA:CPU's late pipeline drops the
remat optimization barriers and CSEs the recomputation back out (verified:
identical optimized HLO) — on the CPU test backend both arms compile to the
same program.  ``tests/test_remat.py`` covers correctness (bit-identical
grads) and jaxpr structure; this tool records the hardware numbers for
BASELINE.md §Remat.

Run:  python tools/ab_remat.py [--res 256] [--batch 8] [--iters 10]
      [--accum 1]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def build_step(jnp, remat: bool, res: int, batch: int, accum: int):
    import jax

    from ugpg_tpu.models.pgunet import PGUNet3, PGUNet4
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    cur = PGUNet4(num_classes=1, dtype=jnp.bfloat16, remat=remat)
    prev = PGUNet3(num_classes=1, dtype=jnp.bfloat16)
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    step = make_seg_train_step(
        cur, tx, stage=4, resolution=res, prev_module=prev,
        prev_resolution=res // 2, alpha=1.0, accum_steps=accum,
    )

    v_cur = cur.init(jax.random.key(0), jnp.zeros((1, res, res, 3)), False)
    v_prev = jax.device_put(
        prev.init(jax.random.key(1), jnp.zeros((1, res // 2, res // 2, 3)), False)
    )
    state = jax.device_put(TrainState.create(v_cur, tx))

    rng = np.random.default_rng(0)
    images = rng.random((batch, res, res, 3), dtype=np.float32)
    masks = jnp.asarray(
        (rng.random((batch, res, res, 1)) > 0.5).astype(np.float32)
    )
    pos_w = jnp.asarray(5.0, jnp.float32)
    key = jax.random.key(2)
    return step, state, v_prev, images, masks, pos_w, key


def measure(remat: bool, res: int, batch: int, iters: int, accum: int):
    import jax
    import jax.numpy as jnp

    step, state, v_prev, images_np, masks, pos_w, key = build_step(
        jnp, remat, res, batch, accum
    )

    # every timed call gets bit-distinct image inputs (host-salted, staged
    # to HBM before the clock starts): a remote/tunneled runtime caches
    # executions keyed on argument buffers, and the chained donated state
    # alone does NOT defeat it — identical image handles let it serve
    # repeats without executing (first attempt measured 0.88 ms/step for a
    # batch-8 stage-4 fwd+bwd, 8.6x above v5e bf16 peak — impossible).
    # bench.py's chained-salt methodology, applied here: the time-derived
    # per-PROCESS salt means a rerun of the same command also never
    # presents buffers a cross-process content-keyed cache has seen.
    staged = images_np.nbytes * (iters + 1)
    if staged > 2 * 2**30:
        raise SystemExit(
            f"staging {staged / 2**30:.1f} GiB of salted image batches to "
            f"HBM ({iters + 1} x {images_np.nbytes / 2**20:.0f} MiB) risks "
            "OOM next to the model+activations on a v5e; reduce --iters "
            "or --batch (every timed call needs its own pre-staged buffer "
            "so the remote runtime cannot serve cached executions)"
        )
    process_salt = np.float32((time.time_ns() % 1_000_000) * 1e-9)
    salted = [
        jax.device_put(images_np + process_salt + np.float32(1e-6 * (i + 1)))
        for i in range(iters + 1)
    ]
    jax.block_until_ready(salted)

    lowered = step.lower(state, v_prev, (salted[0], masks), pos_w, key)
    compiled = lowered.compile()
    mem = compiled.memory_analysis()
    stats = {
        "temp_bytes": int(getattr(mem, "temp_size_in_bytes", -1)),
        "argument_bytes": int(getattr(mem, "argument_size_in_bytes", -1)),
        "output_bytes": int(getattr(mem, "output_size_in_bytes", -1)),
    }

    # run the AOT executable directly — re-invoking the jit-wrapped `step`
    # would compile the identical program a second time (the AOT compile
    # does not populate the jit cache), doubling wall time on TPU.
    # donate_argnums=(0,) is baked in: pass fresh state each call.
    # completion barrier is a HOST FETCH, not block_until_ready: through
    # the axon tunnel block_until_ready returns before remote execution
    # finishes (bench.py methodology; first measurement with the b_u_r
    # barrier reported 0.83 ms for this batch-8 stage-4 fwd+bwd = 4.5x
    # v5e bf16 peak — impossible).  The chained donated state serializes
    # every step, so fetching the LAST step's loss bounds them all.
    state, metrics = compiled(state, v_prev, (salted[0], masks), pos_w, key)
    float(metrics["final_loss"])
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = compiled(
            state, v_prev, (salted[i + 1], masks), pos_w, key
        )
    loss = float(metrics["final_loss"])
    dt = (time.perf_counter() - t0) / iters
    stats["step_s"] = dt
    stats["img_per_s"] = batch / dt
    stats["loss"] = loss
    return stats


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--res", type=int, default=256)
    p.add_argument("--batch", type=int, default=8)
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--accum", type=int, default=1)
    p.add_argument(
        "--arm", choices=("both", "plain", "remat"), default="both",
        help="measure one arm only (each arm's TPU compile is ~7 min "
        "through the tunnel; with JAX_COMPILATION_CACHE_DIR set, a rerun "
        "reuses the compile)",
    )
    args = p.parse_args(argv)

    import os

    os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/ugpg_tpu_cache")

    import jax

    # The axon sitecustomize force-sets jax_platforms='axon,cpu', overriding
    # the JAX_PLATFORMS env var — honor the env var again so CPU smoke runs
    # don't hang on a down TPU tunnel (same dance as tests/conftest.py).
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    print(f"backend: {jax.default_backend()}  devices: {jax.devices()}",
          file=sys.stderr)
    if jax.default_backend() == "cpu":
        print("WARNING: XLA:CPU folds remat away — numbers below will show "
              "no difference; run on TPU.", file=sys.stderr)

    out = {"res": args.res, "batch": args.batch, "accum": args.accum,
           "backend": jax.default_backend()}
    arms = (("plain", False), ("remat", True))
    if args.arm != "both":
        arms = tuple(a for a in arms if a[0] == args.arm)
    for name, remat in arms:
        s = measure(remat, args.res, args.batch, args.iters, args.accum)
        out[name] = s
        print(f"[{name}] temp={s['temp_bytes']/2**20:.1f} MiB  "
              f"step={s['step_s']*1e3:.2f} ms  {s['img_per_s']:.1f} img/s  "
              f"loss={s['loss']:.5f}", file=sys.stderr)

    if "plain" in out and "remat" in out and out["plain"]["temp_bytes"] > 0:
        out["temp_ratio"] = out["remat"]["temp_bytes"] / out["plain"]["temp_bytes"]
        out["time_ratio"] = out["remat"]["step_s"] / out["plain"]["step_s"]
    print(json.dumps(out))


if __name__ == "__main__":
    main()

"""A/B the Pallas fused uncertainty-weighted loss vs the XLA path on TPU.

Times the FULL stage train step (fwd + loss + bwd + RMSprop) both ways at
real train shapes, since that is what the ``fused_loss`` flag switches
(ugpg_tpu/train/steps.py).  Timing: N steps chained through the TrainState
(step k+1 consumes step k's params, so remote execution cannot be elided or
reordered), one host fetch of the final loss as the completion barrier —
avoids paying a tunnel round trip per step.

Run on the TPU:  python tools/ab_fused_loss.py [--iters 10]
Prints one JSON line per (stage, batch, variant).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def bench_variant(stage, batch, fused, iters):
    import jax
    import jax.numpy as jnp

    from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS
    from ugpg_tpu.train.optim import torch_rmsprop
    from ugpg_tpu.train.steps import TrainState, make_seg_train_step

    res = STAGE_RESOLUTIONS[stage]
    module = STAGE_MODELS[stage](num_classes=1, dtype=jnp.bfloat16)
    variables = module.init(jax.random.key(0), jnp.zeros((1, res, res, 3)), False)
    prev_module = prev_vars = None
    if stage > 1:
        prev_res = STAGE_RESOLUTIONS[stage - 1]
        prev_module = STAGE_MODELS[stage - 1](num_classes=1, dtype=jnp.bfloat16)
        prev_vars = prev_module.init(
            jax.random.key(1), jnp.zeros((1, prev_res, prev_res, 3)), False
        )
    tx = torch_rmsprop(1e-4, weight_decay=1e-4)
    step = make_seg_train_step(
        module, tx, stage, res,
        prev_module=prev_module,
        prev_resolution=STAGE_RESOLUTIONS.get(stage - 1),
        donate=True, fused_loss=fused,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, res, res, 3), dtype=np.float32))
    y = jnp.asarray((rng.random((batch, res, res, 1)) > 0.7).astype(np.float32))
    pw = jnp.asarray(5.0)
    pv = prev_vars if prev_vars is not None else {}

    state = TrainState.create(variables, tx)
    state, m = step(state, pv, (x, y), pw, jax.random.key(0))  # compile
    float(m["final_loss"])
    t0 = time.perf_counter()
    for k in range(iters):
        state, m = step(state, pv, (x, y), pw, jax.random.key(k + 1))
    loss = float(m["final_loss"])  # depends on the whole chain
    dt = time.perf_counter() - t0
    return {
        "stage": stage, "batch": batch,
        "variant": "pallas_fused" if fused else "xla",
        "img_per_s": round(batch * iters / dt, 2),
        "ms_per_step": round(1e3 * dt / iters, 3),
        "final_loss": round(loss, 5),
    }


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ugpg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    for stage, batch in ((4, 8), (4, 64)):
        pair = {}
        for fused in (False, True):
            r = bench_variant(stage, batch, fused, args.iters)
            results.append(r)
            pair[r["variant"]] = r
            print(json.dumps(r), flush=True)
        if "xla" in pair and "pallas_fused" in pair:
            speedup = pair["pallas_fused"]["img_per_s"] / pair["xla"]["img_per_s"]
            print(json.dumps({"stage": stage, "batch": batch,
                              "pallas_over_xla": round(speedup, 4)}), flush=True)
    return results


if __name__ == "__main__":
    main()

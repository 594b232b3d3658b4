"""A/B: flagship stage-4 inference (bf16, live-BN) vs W8A8 int8 quantized.

Chained-barrier methodology (bench.py): call k+1's input folds call k's
checksum (sequential execution is forced through the data dependency even
though the 1e-38 term is numerically inert) plus a unique per-call 1e-3
perturbation LARGE enough to change int8 codes — remote execution caching
cannot serve repeats on either path.  Both paths emit the full serving
outputs (preds, probs, uncertainty maps) so nothing is dead-code-eliminated.

Run:  python tools/ab_quant.py [--iters 10] [--batches 64,128]
"""

from __future__ import annotations

import argparse
import itertools
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

_call = itertools.count(1)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=10)
    p.add_argument("--batches", type=str, default="64,128")
    args = p.parse_args(argv)
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from ugpg_tpu.models.pgunet import PGUNet4
    from ugpg_tpu.models.folding import fold_batchnorm
    from ugpg_tpu.ops.quant import QuantizedModel, quantized_forward
    from ugpg_tpu.uncertainty import binary_uncertainty

    rng = np.random.default_rng(0)
    module = PGUNet4(num_classes=1, dtype=jnp.bfloat16)
    variables = jax.device_put(
        module.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), False)
    )
    calib = jnp.asarray(rng.random((8, 256, 256, 3), dtype=np.float32))
    qm = QuantizedModel.from_variables(variables, 4, [calib])
    qparams = jax.device_put(qm.qparams)
    scales = qm.scales

    def postprocess(logits):
        probs = jax.nn.sigmoid(logits)
        preds = (probs > 0.5).astype(jnp.bfloat16)
        unc = binary_uncertainty(probs)
        return preds, probs, unc, jnp.sum(unc)

    @jax.jit
    def fwd_float(v, x, s, i):
        x = x + i * 1e-3 + s * 1e-38
        return postprocess(module.apply(v, x, False))

    @jax.jit
    def fwd_quant(q, x, s, i):
        x = x + i * 1e-3 + s * 1e-38
        return postprocess(quantized_forward(q, scales, 4, x))

    results = {}
    for batch in batches:
        x = jnp.asarray(rng.random((batch, 256, 256, 3), dtype=np.float32))
        for name, fwd, arg0 in (("bf16", fwd_float, variables),
                                ("int8", fwd_quant, qparams)):
            def chain(iters):
                s = jnp.float32(1.0)
                for _ in range(iters):
                    s = fwd(arg0, x, s, jnp.float32(next(_call)))[3]
                float(s)

            chain(1)  # compile + warm
            t0 = time.perf_counter()
            chain(args.iters)
            dt = time.perf_counter() - t0
            rate = batch * args.iters / dt
            results[f"{name}_b{batch}"] = round(rate, 1)
            print(f"{name} b{batch}: {rate:.1f} img/s  ({dt / args.iters * 1e3:.1f} ms/call)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()

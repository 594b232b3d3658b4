"""Measure serving latency per batch bucket + BN-folding A/B on TPU.

Latency is the right metric for the serving path, so each call IS timed
with a blocking host fetch (unlike the throughput benches' chained
timing) — a request isn't done until the caller can read it.

Run on the TPU:  python tools/serving_latency.py
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ugpg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ugpg_tpu.eval.serving import Predictor
    from ugpg_tpu.io.checkpoint import save_checkpoint
    from ugpg_tpu.models.pgunet import PGUNet4

    module = PGUNet4(num_classes=1, dtype=jnp.bfloat16)
    v = module.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), False)
    tmp = tempfile.mkdtemp()
    ckpt = save_checkpoint(Path(tmp) / "s4", v, metadata={"stage": 4})

    rng = np.random.default_rng(0)

    def measure(p, n, iters=10):
        x = rng.random((n, 256, 256, 3), dtype=np.float32)
        p(x)  # warm
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            p(x)
            times.append(time.perf_counter() - t0)
        ms = 1e3 * float(np.median(times))
        return {"n": n, "ms": round(ms, 2),
                "img_per_s": round(n / (ms / 1e3), 1)}

    p = Predictor(str(ckpt), buckets=(1, 8, 64, 128))
    rows = [measure(p, n) for n in (1, 8, 64, 128)]
    # contrast: single-image request forced through the 128 bucket
    p_big = Predictor(str(ckpt), buckets=(128,))
    rows.append({**measure(p_big, 1), "note": "1 image via 128-bucket"})
    print(json.dumps({"bucket_latency": rows}))

    # BN folding A/B at the throughput bucket
    p_fold = p  # fold_bn=True default
    p_plain = Predictor(str(ckpt), buckets=(128,), fold_bn=False)
    a = measure(p_fold, 128)
    b = measure(p_plain, 128)
    print(json.dumps({"bn_fold_ab": {"folded": a, "live_bn": b,
                                     "fold_speedup": round(b["ms"] / a["ms"], 4)}}))


if __name__ == "__main__":
    main()

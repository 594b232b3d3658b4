"""Capture a jax.profiler trace of the flagship bench + derive MFU.

Writes the trace under --out (TensorBoard-compatible) and prints a JSON
summary with the analytic FLOPs/img, measured throughput, and the implied
MXU utilization on v5e (bf16 peak 394 TFLOP/s, HBM 819 GB/s).

The analytic conv FLOP count (dominant; resizes/heads < 1%) is derived from
the PGUNet4 topology (SURVEY.md §2b; ref: UG_unet.py:263-304).

Run on the TPU:  python tools/profile_tpu.py --out /tmp/ugpg_trace
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

V5E_BF16_PEAK_TFLOPS = 394.0
V5E_HBM_GBPS = 819.0


def pgunet4_fwd_gflops_per_img() -> float:
    def dc(h, cin, cout):  # DoubleConv = 3x3 cin->cout + 3x3 cout->cout
        return 2 * h * h * 9 * (cin * cout + cout * cout)

    total = 0
    total += dc(256, 3, 64)      # inc
    total += dc(128, 64, 128)    # down1
    total += dc(64, 128, 256)    # down2
    total += dc(32, 256, 512)    # down3
    total += dc(16, 512, 512)    # down4
    total += dc(32, 1024, 256)   # up1
    total += dc(64, 512, 128)    # up2
    total += dc(128, 256, 64)    # up3
    total += dc(256, 128, 64)    # up4
    for h, c in ((32, 256), (64, 128), (128, 64), (256, 64)):
        total += 2 * h * h * c   # 1x1 heads
    return total / 1e9


def pgunet4_activation_mb_per_img(bytes_per_el: int = 2) -> float:
    """Activation traffic estimate: each DoubleConv writes 2 feature maps and
    reads its input once (XLA fuses BN+ReLU into the conv epilogues)."""
    els = 0
    layers = [  # (h, cin, cout) per DoubleConv
        (256, 3, 64), (128, 64, 128), (64, 128, 256), (32, 256, 512),
        (16, 512, 512), (32, 1024, 256), (64, 512, 128), (128, 256, 64),
        (256, 128, 64),
    ]
    for h, cin, cout in layers:
        els += h * h * (cin + 2 * cout)
    els += 256 * 256 * 4  # heads/sigmoid/uncertainty emission at full res
    return els * bytes_per_el / 1e6


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--out", default="/tmp/ugpg_trace")
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--no-trace", action="store_true",
                   help="skip jax.profiler (timing + MFU math only)")
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/ugpg_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from ugpg_tpu.models.pgunet import PGUNet4
    from ugpg_tpu.uncertainty import binary_uncertainty

    module = PGUNet4(num_classes=1, dtype=jnp.bfloat16)
    variables = jax.device_put(
        module.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), False)
    )

    @jax.jit
    def forward(v, x, s, i):
        # i: unique per call (defeats remote execution caching); s: chained
        # checksum (forces sequencing; 1e-38 contribution is inert but a
        # runtime input, so not DCE-able); full maps returned so the
        # executable materializes what serving emits.
        x = x + i * 1e-6 + s * 1e-38
        logits = module.apply(v, x, False)
        probs = jax.nn.sigmoid(logits)
        preds = (probs > 0.5).astype(jnp.bfloat16)
        unc = binary_uncertainty(probs)
        return preds, probs, unc, jnp.sum(unc)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((args.batch, 256, 256, 3), dtype=np.float32))

    s = forward(variables, x, jnp.float32(0), jnp.float32(0))[3]  # compile
    float(s)

    # chained timing: one barrier for the whole sequence, unique input per call
    t0 = time.perf_counter()
    for k in range(args.iters):
        s = forward(variables, x, s, jnp.float32(k + 1))[3]
    float(s)
    dt = time.perf_counter() - t0
    rate_chained = args.batch * args.iters / dt

    # per-call barrier (latency-style) for contrast
    times = []
    for k in range(6):
        t0 = time.perf_counter()
        float(forward(variables, x, jnp.float32(0), jnp.float32(100 + k))[3])
        times.append(time.perf_counter() - t0)
    rate_barrier = args.batch / float(np.median(times))

    if not args.no_trace:
        with jax.profiler.trace(args.out):
            for k in range(4):
                s = forward(variables, x, s, jnp.float32(200 + k))[3]
            float(s)

    gflops = pgunet4_fwd_gflops_per_img()
    act_mb = pgunet4_activation_mb_per_img()
    summary = {
        "batch": args.batch,
        "img_per_s_chained": round(rate_chained, 1),
        "img_per_s_per_call_barrier": round(rate_barrier, 1),
        "tunnel_overhead_pct": round(100 * (1 - rate_barrier / rate_chained), 1),
        "gflops_per_img": round(gflops, 2),
        "tflops_sustained": round(gflops * rate_chained / 1e3, 1),
        "mxu_utilization_pct_bf16peak": round(
            100 * gflops * rate_chained / 1e3 / V5E_BF16_PEAK_TFLOPS, 1
        ),
        "activation_mb_per_img_est": round(act_mb, 1),
        "hbm_bw_utilization_pct_est": round(
            100 * act_mb * rate_chained / 1e3 / V5E_HBM_GBPS, 1
        ),
        "trace_dir": None if args.no_trace else args.out,
        "device": str(jax.devices()[0]),
    }
    print(json.dumps(summary))


if __name__ == "__main__":
    main()

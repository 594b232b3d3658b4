"""A/B: fused DoubleConv Pallas kernel vs XLA's two convs, on real TPU.

VERDICT r2 #4.  Isolated comparison at the flagship's two hottest block
shapes (stage-4 256px, b128, bf16 — BASELINE.md roofline: inc 5.0 ms/call,
up4 7.5 ms/call, each round-tripping its (N, 256, 256, 64) bf16 mid through
HBM), plus an end-to-end flagship comparison where the folded float walker
(ops/quant.float_folded_forward topology) runs all DoubleConvs through the
kernel.

Chained-barrier timing (bench.py methodology): call k+1 consumes call k's
checksum, unique per-iteration constant folded into the input, one final
host fetch.

Run: python tools/ab_double_conv.py [--batch 128] [--iters 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

_REPO_ROOT = str(Path(__file__).resolve().parent.parent)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def _chain(fn, args0, iters):
    import jax

    s = None
    for i in range(iters):
        s = fn(*args0, jnp_scalar(i if s is None else s))
    return float(jax.numpy.sum(s))


def jnp_scalar(v):
    import jax.numpy as jnp

    return jnp.asarray(v, jnp.float32)


def time_chain(fn, args, iters):
    import jax.numpy as jnp

    # warm (compile)
    s = jnp.float32(0.0)
    s = fn(*args, s)
    float(jnp.sum(s))
    t0 = time.perf_counter()
    s = jnp.float32(1.0)
    for _ in range(iters):
        s = fn(*args, s)
    float(jnp.sum(s))
    return (time.perf_counter() - t0) / iters


def isolated_ab(jnp, jax, batch, iters, tile_h):
    from ugpg_tpu.ops.pallas.double_conv import fused_double_conv

    dn = ("NHWC", "HWIO", "NHWC")

    def xla_block(x, w1, b1, w2, b2):
        y = jax.lax.conv_general_dilated(
            x, w1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        mid = jnp.maximum(y + b1, 0)
        y2 = jax.lax.conv_general_dilated(
            mid, w2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=dn)
        return jnp.maximum(y2 + b2, 0)

    rows = []
    for name, cin, cm in (("up4", 128, 64), ("up3@128px", 128, 64)):
        hw = 128 if "128px" in name else 256
        rng = np.random.default_rng(0)
        x = jnp.asarray(
            rng.standard_normal((batch, hw, hw, cin)), jnp.bfloat16)
        w1 = jnp.asarray(rng.standard_normal((3, 3, cin, cm)) * 0.05, jnp.bfloat16)
        b1 = jnp.asarray(rng.standard_normal((cm,)) * 0.05, jnp.bfloat16)
        w2 = jnp.asarray(rng.standard_normal((3, 3, cm, cm)) * 0.05, jnp.bfloat16)
        b2 = jnp.asarray(rng.standard_normal((cm,)) * 0.05, jnp.bfloat16)

        @jax.jit
        def run_xla(x, w1, b1, w2, b2, s):
            out = xla_block((x + s * 1e-38).astype(x.dtype), w1, b1, w2, b2)
            return out.astype(jnp.float32).sum() + 0 * s + out[0, 0, 0, 0]

        @jax.jit
        def run_pl(x, w1, b1, w2, b2, s):
            out = fused_double_conv((x + s * 1e-38).astype(x.dtype), w1, b1, w2, b2, tile_h=tile_h)
            return out.astype(jnp.float32).sum() + 0 * s + out[0, 0, 0, 0]

        # correctness first
        a = run_xla(x, w1, b1, w2, b2, jnp.float32(0))
        b = run_pl(x, w1, b1, w2, b2, jnp.float32(0))
        rel = abs(float(a) - float(b)) / max(abs(float(a)), 1e-6)
        t_x = time_chain(run_xla, (x, w1, b1, w2, b2), iters)
        t_p = time_chain(run_pl, (x, w1, b1, w2, b2), iters)
        rows.append((name, cin, cm, t_x * 1e3, t_p * 1e3, t_x / t_p, rel))
        print(f"{name}: cin={cin} cm={cm}  XLA {t_x*1e3:.2f} ms  "
              f"pallas {t_p*1e3:.2f} ms  speedup x{t_x/t_p:.3f}  "
              f"checksum rel err {rel:.2e}", flush=True)
    return rows


def flagship_ab(jnp, jax, batch, iters, tile_h):
    """End-to-end folded stage-4 forward: XLA convs vs pallas DoubleConvs."""
    from ugpg_tpu.models.folding import fold_batchnorm
    from ugpg_tpu.models.pgunet import PGUNet4
    from ugpg_tpu.ops.pallas.double_conv import fused_double_conv
    from ugpg_tpu.ops.quant import _TOPOLOGY, _block_params, _fblock, _heads_sum, _pool
    from ugpg_tpu.ops.resize import upsample2x_bilinear_align_corners
    from ugpg_tpu.uncertainty import binary_uncertainty

    module = PGUNet4(num_classes=1, dtype=jnp.bfloat16)
    variables = jax.device_put(
        module.init(jax.random.key(0), jnp.zeros((1, 256, 256, 3)), False)
    )
    folded = jax.device_put(fold_batchnorm(variables))
    params = folded["params"]
    enc, n_ups, heads = _TOPOLOGY[4]

    def walker(x, use_pallas, min_hw):
        def block(cur, name):
            p1, p2 = _block_params(params, name)
            p1_k = _block_params(params, name)[0]["kernel"]
            if (use_pallas and cur.shape[1] >= min_hw
                    and p1_k.shape[2] % 128 == 0):  # DMA lane-dim constraint
                return fused_double_conv(
                    cur,
                    p1["kernel"].astype(jnp.bfloat16),
                    p1["bias"].astype(jnp.bfloat16),
                    p2["kernel"].astype(jnp.bfloat16),
                    p2["bias"].astype(jnp.bfloat16),
                    tile_h=min(tile_h, cur.shape[1]),
                )
            return _fblock(cur, p1, p2, jnp.bfloat16)[1]

        x = x.astype(jnp.bfloat16)
        enc_out = []
        cur = x
        for i, name in enumerate(enc):
            if i > 0:
                cur = _pool(cur)
            cur = block(cur, name)
            enc_out.append(cur)
        dec_out = []
        for i in range(n_ups):
            name = f"up{i + 1}"
            skip = enc_out[len(enc) - 2 - i]
            up = upsample2x_bilinear_align_corners(cur)
            cur = block(jnp.concatenate([skip, up], axis=-1), name)
            dec_out.append(cur)
        from ugpg_tpu.ops.quant import _head_params

        head_params = {
            h: {"kernel": _head_params(params, h)[0],
                "bias": _head_params(params, h)[1]}
            for h in heads
        }
        return _heads_sum(dec_out, heads, head_params, dec_out[-1].shape[1])

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((batch, 256, 256, 3)), jnp.float32)

    def make_run(use_pallas, min_hw=64):
        @jax.jit
        def run(x, s):
            logits = walker(x + s * 1e-38, use_pallas, min_hw)
            probs = jax.nn.sigmoid(logits)
            preds = (probs > 0.5).astype(jnp.bfloat16)
            unc = binary_uncertainty(probs)
            return jnp.sum(unc) + jnp.sum(preds.astype(jnp.float32)) * 1e-6
        return run

    run_xla = make_run(False)
    a = float(run_xla(x, jnp.float32(0)))
    t_x = time_chain(run_xla, (x,), iters)
    print(f"flagship folded XLA: {batch / t_x:.1f} img/s "
          f"({t_x*1e3:.1f} ms)", flush=True)
    for min_hw in (256, 128, 64):
        run_pl = make_run(True, min_hw)
        b = float(run_pl(x, jnp.float32(0)))
        rel = abs(a - b) / max(abs(a), 1e-6)
        t_p = time_chain(run_pl, (x,), iters)
        print(f"flagship pallas (blocks >= {min_hw}px): "
              f"{batch / t_p:.1f} img/s ({t_p*1e3:.1f} ms)  "
              f"x{t_x/t_p:.3f} vs XLA  checksum rel {rel:.2e}", flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tile_h", type=int, default=16)
    p.add_argument("--skip_flagship", action="store_true")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    isolated_ab(jnp, jax, args.batch, args.iters, args.tile_h)
    if not args.skip_flagship:
        flagship_ab(jnp, jax, args.batch, args.iters, args.tile_h)


if __name__ == "__main__":
    main()

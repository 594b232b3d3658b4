"""Host-side decode benchmarks: native C++ decoders vs PIL.

Reproduces the BASELINE.md §"Native TIFF decoder" table (and the PNG
equivalent) on synthetic tissue-like content at MoNuSeg scales: whole
slides are 1000x1000 RGB TIFFs, aug patches are 256x256 RGB PNGs.
Pure host benchmark — no JAX, safe to run while the TPU tunnel is down.

Run:  python tools/bench_decode.py [--iters 30] [--size 1000]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def tissue_like(size: int, seed: int = 0) -> np.ndarray:
    """Smooth blobs + noise: realistic compression ratios (white noise
    makes LZW degenerate, constant images make it trivial)."""
    g = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size]
    base = (
        128 + 60 * np.sin(yy / 37.0) * np.cos(xx / 29.0)
        + 20 * g.standard_normal((size, size))
    ).clip(0, 255)
    return np.stack([base, base * 0.8, base * 0.9], -1).astype(np.uint8)


def timeit(fn, iters: int) -> float:
    t0 = time.perf_counter()
    for _ in range(iters):
        fn()
    return (time.perf_counter() - t0) / iters


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--size", type=int, default=1000, help="TIFF slide size")
    p.add_argument("--png_size", type=int, default=256, help="PNG patch size")
    args = p.parse_args(argv)

    from PIL import Image

    from ugpg_tpu.native import (
        decode_png_native,
        decode_tiff_native,
        png_available,
        tiff_available,
    )

    rows = []

    if tiff_available():
        img = tissue_like(args.size)
        for comp in (None, "tiff_lzw", "packbits", "tiff_deflate"):
            b = io.BytesIO()
            kw = {"compression": comp} if comp else {}
            Image.fromarray(img).save(b, format="TIFF", **kw)
            data = b.getvalue()
            got = decode_tiff_native(data)
            assert got is not None and np.array_equal(got, img), comp
            t_nat = timeit(lambda: decode_tiff_native(data), args.iters)
            t_pil = timeit(
                lambda: np.asarray(Image.open(io.BytesIO(data)).convert("RGB")),
                args.iters,
            )
            rows.append({
                "format": "tiff", "compression": comp or "none",
                "file_mib": len(data) / 2**20,
                "native_ms": t_nat * 1e3, "pil_ms": t_pil * 1e3,
                "speedup": t_pil / t_nat,
            })
    else:
        print("native tiff decoder unavailable", file=sys.stderr)

    if png_available():
        img = tissue_like(args.png_size, seed=1)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="PNG")
        data = b.getvalue()
        got = decode_png_native(data)
        assert got is not None and np.array_equal(got, img)
        t_nat = timeit(lambda: decode_png_native(data), args.iters)
        t_pil = timeit(
            lambda: np.asarray(Image.open(io.BytesIO(data)).convert("RGB")),
            args.iters,
        )
        rows.append({
            "format": "png", "compression": "zlib",
            "file_mib": len(data) / 2**20,
            "native_ms": t_nat * 1e3, "pil_ms": t_pil * 1e3,
            "speedup": t_pil / t_nat,
        })
    else:
        print("native png decoder unavailable", file=sys.stderr)

    from ugpg_tpu.native import bmp_available, decode_bmp_native

    if bmp_available():
        # Herlev cell images are small variable-size BMPs (~150x140)
        img = tissue_like(150, seed=2)
        b = io.BytesIO()
        Image.fromarray(img).save(b, format="BMP")
        data = b.getvalue()
        got = decode_bmp_native(data)
        assert got is not None and np.array_equal(got, img)
        iters = args.iters * 10  # sub-ms per decode: more reps for signal
        t_nat = timeit(lambda: decode_bmp_native(data), iters)
        t_pil = timeit(
            lambda: np.asarray(Image.open(io.BytesIO(data)).convert("RGB")),
            iters,
        )
        rows.append({
            "format": "bmp", "compression": "none",
            "file_mib": len(data) / 2**20,
            "native_ms": t_nat * 1e3, "pil_ms": t_pil * 1e3,
            "speedup": t_pil / t_nat,
        })
    else:
        print("native bmp decoder unavailable", file=sys.stderr)

    for r in rows:
        print(
            f"{r['format']:5s} {r['compression']:9s} file={r['file_mib']:.1f}MiB"
            f"  native={r['native_ms']:6.2f}ms  PIL={r['pil_ms']:6.2f}ms"
            f"  speedup={r['speedup']:.2f}x",
            file=sys.stderr,
        )
    print(json.dumps(rows))


if __name__ == "__main__":
    main()

"""Serve checkpoints / exported artifacts over HTTP.

Usage:
    # one or more models; seg is the default task
    python -m ugpg_tpu.cli.serve --model seg=out/ug_pgunet_stage4_best \
        --cls_model cls=out/herlev_stage4_best --classes 7 \
        --artifact seg_v2=exported/stage4 \
        [--port 8000] [--buckets 1 8 64] [--uint8] [--max_latency_ms 5]

Endpoints: GET /v1/health, GET /v1/models[/<name>],
POST /v1/models/<name>:predict (application/x-npy or application/json) —
see ugpg_tpu/eval/http_server.py.  Single-image requests from concurrent
clients are micro-batched into shared device calls.

The reference ships no serving surface (its "inference" is a per-image
Python loop inside an eval CLI, ref: MoNuSegImprove/test_monuseg.py:164-201).
"""

from __future__ import annotations

import argparse


def _split_spec(spec: str) -> tuple[str, str]:
    if "=" not in spec:
        raise SystemExit(f"model spec must be name=path, got {spec!r}")
    name, path = spec.split("=", 1)
    return name, path


def resolve_buckets(buckets, mesh) -> list[int]:
    """Default buckets are per-chip (1, 8, 64): under a mesh they scale by
    the data-axis size — bucket 1 could never divide it, so unscaled
    defaults would fail Predictor validation at startup.  User-passed
    buckets are validated here with a CLI-level message instead of the
    constructor's deeper one."""
    if buckets is None:
        scale = mesh.shape["data"] if mesh is not None else 1
        return [1 * scale, 8 * scale, 64 * scale]
    if mesh is not None:
        n = mesh.shape["data"]
        bad = [b for b in buckets if b % n]
        if bad:
            raise SystemExit(
                f"--buckets {bad} do not divide by the mesh data axis ({n}); "
                f"every bucket is sharded across the data axis, so pass "
                f"multiples of {n}"
            )
    return list(buckets)


def main(argv=None):
    p = argparse.ArgumentParser(description="HTTP serving front end")
    p.add_argument("--model", action="append", default=[], metavar="NAME=CKPT",
                   help="segmentation checkpoint to serve (repeatable)")
    p.add_argument("--cls_model", action="append", default=[],
                   metavar="NAME=CKPT",
                   help="classification checkpoint to serve (repeatable)")
    p.add_argument("--slide_model", action="append", default=[],
                   metavar="NAME=CKPT",
                   help="segmentation checkpoint served at NATIVE "
                        "resolution: arbitrary-size requests run "
                        "convolutionally on the full image (no lossy "
                        "downsize to the stage res); under --mesh the "
                        "image is spatially sharded with halo exchange "
                        "(repeatable)")
    p.add_argument("--pad_multiple", type=int, default=None,
                   help="--slide_model: quantize padded sizes to multiples "
                        "of N (bounds recompiles under mixed-size traffic)")
    p.add_argument("--artifact", action="append", default=[],
                   metavar="NAME=DIR",
                   help="exported StableHLO artifact directory — bucket "
                        "(Predictor.export) or slide (SlidePredictor."
                        "export), dispatched by manifest (repeatable)")
    p.add_argument("--mc_dropout", type=int, default=0, metavar="N",
                   help="classification models: N MC-dropout passes per "
                        "request; adds a per-sample mc_variance output "
                        "(epistemic uncertainty)")
    p.add_argument("--classes", type=int, default=7,
                   help="num_classes for --cls_model entries")
    p.add_argument("--buckets", type=int, nargs="+", default=None,
                   help="batch buckets to AOT-compile (default: 1 8 64; "
                        "under --mesh the defaults scale by the data-axis "
                        "size so every bucket keeps a whole per-chip batch)")
    p.add_argument("--uint8", action="store_true",
                   help="compile for raw uint8 RGB request tensors")
    p.add_argument("--mesh", type=str, default=None, metavar="N[,M]",
                   help="multi-chip serving over an (N data x M model) "
                   "mesh: every bucket compiles as one GSPMD program with "
                   "the request batch sharded over 'data' (buckets must "
                   "divide by N); M>1 additionally shards the wide conv "
                   "kernels over 'model' (TP, bf16 paths only); applies "
                   "to --model/--cls_model entries")
    p.add_argument("--compact", action="store_true",
                   help="uint8 preds + float16 maps in responses")
    p.add_argument("--host", default="0.0.0.0")
    p.add_argument("--port", type=int, default=8000)
    p.add_argument("--max_latency_ms", type=float, default=5.0,
                   help="micro-batcher deadline for single-image requests")
    p.add_argument("--verbose", action="store_true")
    args = p.parse_args(argv)

    if not (args.model or args.cls_model or args.slide_model or args.artifact):
        raise SystemExit(
            "nothing to serve: pass --model/--cls_model/--slide_model/"
            "--artifact"
        )

    import jax.numpy as jnp

    from ugpg_tpu.eval.http_server import ServingHTTPServer
    from ugpg_tpu.eval.serving import ServingRegistry

    registry = ServingRegistry(max_latency_ms=args.max_latency_ms)
    input_dtype = jnp.uint8 if args.uint8 else jnp.float32
    mesh, shard_model = None, False
    if args.mesh is not None:
        # shared CLI mesh grammar + multi-host initialize()
        from ugpg_tpu.cli.train_monuseg import parse_mesh

        mesh = parse_mesh(args.mesh)
        shard_model = mesh.shape["model"] > 1
    buckets = resolve_buckets(args.buckets, mesh)
    for spec in args.model:
        name, ckpt = _split_spec(spec)
        registry.register(name, ckpt, buckets=tuple(buckets),
                          input_dtype=input_dtype,
                          compact_output=args.compact, dtype=None,
                          mesh=mesh, shard_model=shard_model)
    for spec in args.cls_model:
        name, ckpt = _split_spec(spec)
        registry.register(name, ckpt, task_type="classification",
                          num_classes=args.classes,
                          buckets=tuple(buckets),
                          input_dtype=input_dtype, dtype=None,
                          mesh=mesh, shard_model=shard_model,
                          mc_dropout=args.mc_dropout)
    for spec in args.slide_model:
        name, ckpt = _split_spec(spec)
        # H shards over 'data'; a model axis > 1 additionally shards W —
        # the 2-D halo grid (parallel/spatial.py)
        w_axis = "model" if (mesh is not None and mesh.shape["model"] > 1) else None
        registry.register_slide(name, ckpt, mesh=mesh, w_axis=w_axis,
                                pad_multiple=args.pad_multiple,
                                compact_output=args.compact)
    for spec in args.artifact:
        name, path = _split_spec(spec)
        registry.register_artifact(name, path)

    server = ServingHTTPServer(registry, host=args.host, port=args.port,
                               verbose=args.verbose)
    print(f"serving {registry.names()} on http://{server.host}:{server.port}"
          " (Ctrl-C to stop)", flush=True)
    try:
        server.serve_forever()
    finally:
        registry.close()


if __name__ == "__main__":
    main()

"""Load-test the HTTP serving endpoint: concurrent single-image clients.

Measures the claim that matters for the HTTP front end: concurrent
single-image requests COALESCE into shared device calls through the
micro-batcher.  Spawns its own server (in-process, random port) over a
fresh stage-1 checkpoint unless --url points at a running one, fires
``--clients`` threads x ``--requests`` single-image npy POSTs each, and
reports client-side latency percentiles, request throughput, and the
server's /v1/stats coalescing ratio (mean_group > 1 == batching worked).

Usage:
    python tools/http_load_test.py [--clients 8] [--requests 20]
        [--max_latency_ms 10] [--url http://host:port --model name]
"""

from __future__ import annotations

import argparse
import io
import json
import sys
import threading
import time
from http.client import HTTPConnection
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def _post_npy(host, port, path, arr, timeout=120):
    buf = io.BytesIO()
    np.save(buf, arr)
    conn = HTTPConnection(host, port, timeout=timeout)
    conn.request("POST", path, body=buf.getvalue(),
                 headers={"Content-Type": "application/x-npy"})
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    if resp.status != 200:
        raise RuntimeError(f"{resp.status}: {data[:200]!r}")
    return np.load(io.BytesIO(data))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--clients", type=int, default=8)
    ap.add_argument("--requests", type=int, default=20,
                    help="single-image requests per client")
    ap.add_argument("--max_latency_ms", type=float, default=10.0)
    ap.add_argument("--url", default=None,
                    help="use a running server (http://host:port) instead "
                         "of spawning one")
    ap.add_argument("--model", default="m", help="model name on --url")
    args = ap.parse_args(argv)

    owned = None
    if args.url:
        host, port = args.url.removeprefix("http://").split(":")
        port = int(port)
        name = args.model
        res = 32  # caller's model resolution is unknown; server resizes
    else:
        import tempfile

        import jax

        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
        import jax.numpy as jnp

        from ugpg_tpu.eval.http_server import ServingHTTPServer
        from ugpg_tpu.eval.serving import ServingRegistry
        from ugpg_tpu.io.checkpoint import save_checkpoint
        from ugpg_tpu.models.pgunet import PGUNet1

        tmp = tempfile.mkdtemp(prefix="ugpg_load_")
        module = PGUNet1(num_classes=1)
        v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
        ckpt = save_checkpoint(Path(tmp) / "s1", v, metadata={"stage": 1})
        registry = ServingRegistry(max_latency_ms=args.max_latency_ms)
        registry.register("m", str(ckpt), dtype=None,
                          buckets=(1, max(2, args.clients)))
        server = ServingHTTPServer(registry, port=0)
        port = server.start()
        host, name, res = "127.0.0.1", "m", 32
        owned = (server, registry)

    rng = np.random.default_rng(0)
    images = rng.random((args.clients, res, res, 3)).astype(np.float32)
    path = f"/v1/models/{name}:predict"
    latencies: list[float] = []
    lat_lock = threading.Lock()
    errors: list[str] = []
    start_barrier = threading.Barrier(args.clients)

    def client(i):
        try:
            start_barrier.wait()
            for _ in range(args.requests):
                t0 = time.perf_counter()
                out = _post_npy(host, port, path, images[i])
                dt = time.perf_counter() - t0
                assert out["probs"].shape[-3] == res
                with lat_lock:
                    latencies.append(dt)
        except Exception as exc:  # surface, don't hang the join
            errors.append(f"client {i}: {exc}")

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.clients)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    if errors:
        raise SystemExit("\n".join(errors))

    lat = np.sort(np.asarray(latencies)) * 1e3
    n = len(lat)
    conn = HTTPConnection(host, port, timeout=30)
    conn.request("GET", "/v1/stats")
    stats = json.loads(conn.getresponse().read())
    conn.close()
    if owned:
        owned[0].close()
        owned[1].close()

    batcher = stats.get(name, {}).get("batcher", {})
    report = {
        "clients": args.clients,
        "requests": n,
        "wall_s": round(wall, 3),
        "req_per_s": round(n / wall, 2),
        "latency_ms": {
            "p50": round(float(lat[n // 2]), 2),
            "p95": round(float(lat[min(n - 1, int(0.95 * n))]), 2),
            "p99": round(float(lat[min(n - 1, int(0.99 * n))]), 2),
        },
        "coalescing": batcher,
    }
    print(json.dumps(report))
    if batcher and batcher.get("mean_group", 0) <= 1.0 and args.clients > 1:
        print("WARNING: mean_group <= 1 — concurrent requests did not "
              "coalesce (deadline too short or clients too slow?)",
              file=sys.stderr)
    return report


if __name__ == "__main__":
    main()

"""Model-code-free serving of exported StableHLO artifacts.

``Predictor.export`` (eval/serving.py) writes per-bucket versioned
StableHLO modules with the weights baked in; ``ExportedPredictor`` here
serves such an artifact.  This module deliberately imports only
jax + numpy (plus ops/resize.py, itself jax-only): a deployment host can

    from ugpg_tpu.eval.exported import ExportedPredictor

without flax, the model zoo, or the checkpoint loaders — the package
``__init__`` resolves its exports lazily, so nothing else is pulled in.

``_BucketRouter`` holds the request routing/coercion shared with the live
``Predictor`` (ragged batches route to the smallest bucket that fits,
padding stripped from responses, uint8/float32 requests coerced to the
compiled signature); subclasses provide ``_dispatch``.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ugpg_tpu.ops.resize import resize_bilinear_align_corners

__all__ = ["ExportedPredictor"]


class _BucketRouter:
    """Fixed-bucket request routing over compiled executables.

    Requires attributes: ``buckets`` (ascending), ``batch_size`` (largest
    bucket), ``resolution``, ``input_dtype``, ``_n_outputs``; and a
    ``_dispatch(bucket, device_chunk) -> tuple`` implementation.

    Subclasses call ``_BucketRouter.__init__`` to get request counters;
    ``stats()`` reports them (requests, images, device calls, latency
    percentiles over a sliding window).
    """

    def __init__(self):
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_images = 0
        self._n_device_calls = 0
        self._total_s = 0.0
        self._latencies = deque(maxlen=1024)  # per-request wall seconds

    def _dispatch(self, bucket: int, chunk):
        raise NotImplementedError

    def stats(self) -> dict:
        """Request counters + latency percentiles (sliding 1024 window)."""
        with self._stats_lock:
            lat = list(self._latencies)
            out = {
                "requests": self._n_requests,
                "images": self._n_images,
                "device_calls": self._n_device_calls,
                "total_seconds": round(self._total_s, 6),
            }
        lat.sort()  # outside the lock: don't stall the request hot path
        if lat:
            def pct(p):
                return round(lat[min(len(lat) - 1,
                                     int(p / 100.0 * len(lat)))] * 1e3, 3)
            out["latency_ms"] = {"p50": pct(50), "p95": pct(95),
                                 "p99": pct(99)}
        return out

    def _record(self, dt: float, n_images: int, n_device_calls: int) -> None:
        """Fold one served request into the counters (shared by the bucket
        ``__call__`` below and the native-resolution ``SlidePredictor``)."""
        with self._stats_lock:
            self._n_requests += 1
            self._n_images += n_images
            self._n_device_calls += n_device_calls
            self._total_s += dt
            self._latencies.append(dt)

    def _bucket_for(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        return self.buckets[-1]

    def _coerce(self, images: np.ndarray) -> np.ndarray:
        """Match the compiled input signature: dtype and spatial size."""
        images = np.asarray(images)
        res = self.resolution
        if self.input_dtype == jnp.dtype(jnp.uint8):
            if images.dtype != np.uint8:
                images = np.clip(np.asarray(images, np.float32) * 255.0,
                                 0, 255).astype(np.uint8)
        else:
            if images.dtype == np.uint8:
                images = images.astype(np.float32) / 255.0
            else:
                images = np.asarray(images, np.float32)
        if images.shape[1:3] != (res, res):
            # arbitrary request sizes: resize on host once (rare path; the
            # compiled executables expect the model resolution)
            x = jnp.asarray(images.astype(np.float32)
                            if images.dtype == np.uint8 else images)
            if images.dtype == np.uint8:
                x = x / 255.0
            x = resize_bilinear_align_corners(x, (res, res))
            images = np.asarray(x)
            if self.input_dtype == jnp.dtype(jnp.uint8):
                images = np.clip(images * 255.0, 0, 255).astype(np.uint8)
        return images

    def _run_padded(self, chunk: np.ndarray):
        n = chunk.shape[0]
        bucket = self._bucket_for(n)
        if n < bucket:
            pad = np.zeros((bucket - n, *chunk.shape[1:]), chunk.dtype)
            chunk = np.concatenate([chunk, pad])
        # hand the host array to _dispatch as-is: each backend places it
        # (a mesh-sharded Predictor device_puts straight to per-chip
        # shards; single-device paths let the executable stage it)
        outs = self._dispatch(bucket, chunk)
        return tuple(o[:n] for o in outs)

    def __call__(self, images: np.ndarray):
        """images: (N, H, W, 3) float32 in [0,1] or uint8 RGB; any N.
        Segmentation -> numpy (preds, probs, uncertainty); classification ->
        (labels, probs)."""
        t0 = time.perf_counter()
        images = self._coerce(images)
        outs = [
            self._run_padded(images[s : s + self.batch_size])
            for s in range(0, len(images), self.batch_size)
        ]
        result = tuple(
            np.concatenate([np.asarray(o[i]) for o in outs])
            for i in range(self._n_outputs)
        )
        self._record(time.perf_counter() - t0, len(images), len(outs))
        return result


class ExportedPredictor(_BucketRouter):
    """Serve a ``Predictor.export`` artifact — no model code or checkpoint.

    Loads the per-bucket StableHLO modules (weights baked in) and exposes
    the same request surface as ``Predictor``.  Works on any platform the
    artifact was exported for (default: cpu + tpu) and composes with
    ``BatchingServer``.
    """

    def __init__(self, path):
        from jax import export as jexport

        _BucketRouter.__init__(self)
        path = Path(path)
        manifest = json.loads((path / "manifest.json").read_text())
        if manifest.get("format_version") != 1:
            raise ValueError(
                f"unsupported artifact format: {manifest.get('format_version')}"
            )
        self.manifest = manifest
        self.task_type = manifest["task_type"]
        self.stage = manifest["stage"]
        self.resolution = manifest["resolution"]
        self.buckets = tuple(manifest["buckets"])
        self.batch_size = self.buckets[-1]
        self.input_dtype = jnp.dtype(manifest["input_dtype"])
        self._n_outputs = manifest["n_outputs"]
        self._fns = {
            b: jexport.deserialize(
                (path / f"bucket_{b}.stablehlo").read_bytes()
            )
            for b in self.buckets
        }

    def _dispatch(self, bucket: int, chunk):
        return self._fns[bucket].call(chunk)

"""Production inference: fixed-shape compiled predictors, micro-batching.

Serving on TPU wants static shapes (one compiled executable per shape),
saturated batches, and no stragglers recompiling.  Three layers:

* ``Predictor`` — a checkpoint AOT-compiled at one or more batch-size
  *buckets* (``jit(...).lower().compile()``; first request pays nothing).
  Ragged request batches route to the smallest bucket that fits (padding
  stripped from the response), so low-load latency is not taxed by the
  throughput bucket.  Segmentation (preds/probs/uncertainty) and
  classification (``task_type="classification"``: labels/probs) flavors.
* ``Predictor.stream`` — bulk scoring with the host->HBM copy of batch k+1
  overlapped with compute of batch k (double-buffered prefetch).
* ``BatchingServer`` — a dynamic micro-batcher: concurrent ``submit()``
  callers are coalesced until a bucket fills or ``max_latency_ms`` expires,
  one device call serves the group, futures resolve per caller.  The
  standard TPU-serving front end (deadline-bounded batching), absent from
  the reference (per-image Python loop, ref: test_monuseg.py:164-201).
* ``ServingRegistry`` — named multi-model serving over the above (stage
  variants / seg + cls side by side), with lazy per-model micro-batchers.

BatchNorm folding (``fold_bn=True``) bakes the BN affine into conv weights
(models/folding.py) — numerically identical, slightly smaller weight set;
measured on v5e it is throughput-neutral because XLA already fuses
eval-mode BN into the conv epilogue (see BASELINE.md).
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Iterator, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.eval.exported import ExportedPredictor, _BucketRouter
from ugpg_tpu.io.checkpoint import load_checkpoint, sniff_stage
from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS
from ugpg_tpu.ops.resize import resize_bilinear_align_corners
from ugpg_tpu.uncertainty import binary_uncertainty

__all__ = [
    "Predictor",
    "ExportedPredictor",
    "BatchingServer",
    "ServingRegistry",
]


class Predictor(_BucketRouter):
    """Fixed-bucket compiled predictor.

    Example:
        p = Predictor("out/ug_pgunet_stage4_best", buckets=(1, 8, 64))
        preds, probs, unc = p(images)          # any leading batch size

        c = Predictor("out/herlev_stage4_best", task_type="classification",
                      num_classes=7)
        labels, probs = c(images)
    """

    def __init__(
        self,
        checkpoint: str,
        batch_size: int = 64,
        num_classes: int = 1,
        dtype=jnp.bfloat16,
        threshold: float = 0.5,
        emit_uncertainty: bool = True,
        fold_bn: bool = True,
        task_type: str = "segmentation",
        buckets: Sequence[int] | None = None,
        input_dtype=jnp.float32,
        quantize: bool = False,
        calibration_batches=None,
        compact_output: bool = False,
        mesh=None,
        shard_model: bool = False,
        mc_dropout: int = 0,
        mc_seed: int = 0,
    ):
        """``input_dtype=jnp.uint8`` compiles the executables for raw uint8
        RGB requests (scaled to [0,1] on device): 4x less host->device
        transfer per request — the dominant serving cost over a network or
        PCIe link.  float32 requests are converted on the host in that case.

        ``quantize=True`` serves the W8A8 int8 path (ops/quant.py):
        BN-folded weights per-channel int8-quantized, activations
        calibrated on ``calibration_batches`` (iterable of (B, H, W, 3)
        float arrays in the model's input range — REQUIRED; random
        calibration silently degrades accuracy, so there is deliberately
        no fallback).  Segmentation: full int8 forward (+6.4% over bf16
        at the 128 bucket, BASELINE.md, logits within ~1e-3 of float).
        Classification: int8 encoder with the f32 GAP + MLP head.
        Throughput note: batch 128 is a SHARP measured optimum for the
        int8 seg path on v5e — off-128 throughput buckets invert the int8
        advantage to ~-5% vs bf16 (BASELINE.md batch-size sensitivity), so
        a largest bucket that is not a multiple of 128 raises a warning.

        ``compact_output=True`` (segmentation only) returns preds as uint8
        and probs/uncertainty as float16 — 2.4x fewer response bytes.
        Remote serving is response-transfer-bound (a 128 x 256² request
        fetches ~100 MB of f32 maps; the maps, not the compute, dominate
        the wall over any network/PCIe link); float16 is exact to ~5e-4
        on [0, 1] probabilities.

        ``mesh`` (a ``jax.sharding.Mesh`` with a ``'data'`` axis, e.g.
        ``parallel.mesh.make_mesh()``): data-parallel serving — every
        bucket compiles as ONE GSPMD program with the request batch
        sharded over ``'data'`` and the weights replicated, so one
        ``Predictor`` saturates a whole slice (ICI collectives, not a
        Python fan-out).  Buckets must divide by the ``'data'`` axis size;
        outputs are gathered to host exactly as in the single-chip path.
        Numerically identical to an unsharded predictor per image.

        ``shard_model=True`` (with a mesh whose ``'model'`` axis is > 1)
        additionally shards the wide conv kernels over ``'model'`` — the
        training TP layout (``parallel.mesh.param_shardings``) applied to
        serving, for latency on small buckets where DP alone leaves chips
        idle.  Composes with ``quantize=True``: the int8 ``wq`` kernels
        shard on the same output-channel axis their per-channel scales
        index, so the scale+bias+ReLU+requant epilogue stays pointwise on
        the sharded channels (the scales themselves replicate — GSPMD
        slices them per shard).

        ``mc_dropout=N`` (classification only): Monte-Carlo-dropout
        epistemic uncertainty — N stochastic head passes (dropout active,
        encoder BN in eval mode; the standard MC setup) vmapped inside the
        same compiled program; the response gains a third output, the
        per-sample predictive variance ``(B,)``
        (``uncertainty.mc_dropout_uncertainty``).  Labels/probs come from
        the MC MEAN.  Keys derive from ``mc_seed`` only, so identical
        requests get identical responses (reproducible serving).  Not
        combinable with ``quantize`` (the int8 graph has no dropout).
        """
        _BucketRouter.__init__(self)
        if task_type not in ("segmentation", "classification"):
            raise ValueError(f"unknown task_type: {task_type!r}")
        if compact_output and task_type != "segmentation":
            raise ValueError("compact_output=True supports segmentation only")
        if mc_dropout:
            if task_type != "classification":
                raise ValueError(
                    "mc_dropout requires task_type='classification': the "
                    "PGUNet segmentation stages have no dropout layers "
                    "(the seg uncertainty map is the 1-2|p-0.5| output "
                    "already in the response)"
                )
            if quantize:
                raise ValueError(
                    "mc_dropout is not supported with quantize=True: the "
                    "int8 classification graph has no dropout layers"
                )
            if mc_dropout < 2:
                raise ValueError(
                    f"mc_dropout={mc_dropout}: need >= 2 stochastic passes "
                    "for a variance"
                )
        pred_dtype = jnp.uint8 if compact_output else jnp.float32
        map_dtype = jnp.float16 if compact_output else jnp.float32
        self.task_type = task_type
        self.input_dtype = jnp.dtype(input_dtype)
        if self.input_dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.uint8)):
            raise ValueError("input_dtype must be float32 or uint8")
        self.buckets = tuple(sorted(set(buckets or (batch_size,))))
        self.batch_size = self.buckets[-1]
        self.stage = sniff_stage(checkpoint, default=4)

        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            if "data" not in mesh.axis_names:
                raise ValueError(
                    f"mesh must have a 'data' axis, got {mesh.axis_names}"
                )
            n_data = mesh.shape["data"]
            bad = [b for b in self.buckets if b % n_data]
            if bad:
                raise ValueError(
                    f"buckets {bad} do not divide by the mesh 'data' axis "
                    f"size ({n_data}): each bucket is one GSPMD program "
                    "with the batch split evenly over chips"
                )
            self._var_sharding = NamedSharding(mesh, PartitionSpec())
            self._batch_sharding = NamedSharding(mesh, PartitionSpec("data"))
            self._shard_model = bool(shard_model) and mesh.shape.get("model", 1) > 1
        else:
            n_data = 1
            self._var_sharding = self._batch_sharding = None
            self._shard_model = False

        if quantize:
            if calibration_batches is None:
                raise ValueError(
                    "quantize=True requires calibration_batches: an iterable "
                    "of (B, H, W, 3) float arrays from the REAL input "
                    "distribution (activation scales calibrated on random "
                    "data silently degrade accuracy, so there is no default)"
                )
            # the 128 optimum is a per-chip tiling property: under a mesh
            # each chip sees bucket/n_data images per call
            if (
                task_type == "segmentation"
                and self.batch_size // n_data >= 32
                and (self.batch_size // n_data) % 128 != 0
            ):
                import warnings

                warnings.warn(
                    f"quantize=True with largest per-chip bucket "
                    f"{self.batch_size // n_data}: "
                    "batch 128 is a sharp measured optimum for the int8 seg "
                    "path on TPU v5e — off-128 throughput buckets run SLOWER "
                    "than bf16 (BASELINE.md batch-size sensitivity); use a "
                    "multiple of 128 (latency buckets < 32 are fine)",
                    stacklevel=2,
                )

        if task_type == "classification":
            from ugpg_tpu.models.classifier import (
                CLS_STAGE_RESOLUTIONS,
                HerlevClassificationModel,
            )

            self.resolution = CLS_STAGE_RESOLUTIONS[self.stage]
            # classification keeps live BN (the eval path is numerically
            # identical either way; folding targets the seg stages)
            self.module = HerlevClassificationModel(
                stage=self.stage, num_classes=num_classes, dtype=dtype
            )
            template = self.module.init(
                jax.random.key(0),
                jnp.zeros((1, self.resolution, self.resolution, 3)),
                False,
            )
            variables = load_checkpoint(checkpoint, variables_template=template)[0]
            n_outputs = 2

            if quantize:
                from ugpg_tpu.models.folding import fold_batchnorm
                from ugpg_tpu.ops.quant import (
                    calibrate_cls,
                    quantize_cls_weights,
                    quantized_cls_forward,
                )

                variables = fold_batchnorm(variables)
                if calibration_batches is None:
                    calibration_batches = [
                        jax.random.uniform(
                            jax.random.key(7),
                            (8, self.resolution, self.resolution, 3),
                        )
                    ]
                scales = calibrate_cls(variables, self.stage, calibration_batches)
                variables = quantize_cls_weights(variables, self.stage, scales)
                stage = self.stage

                def forward(qparams, images):
                    logits = quantized_cls_forward(qparams, scales, stage, images)
                    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                    return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

            elif mc_dropout:
                from ugpg_tpu.uncertainty import mc_dropout_uncertainty

                n_outputs = 3
                mc_key = jax.random.key(mc_seed)

                def forward(variables, images):
                    mean, var = mc_dropout_uncertainty(
                        lambda xx, rngs: self.module.apply(
                            variables, xx, False, mc_dropout=True, rngs=rngs
                        ),
                        images, mc_key, num_samples=mc_dropout,
                        task_type="classification",
                    )
                    labels = jnp.argmax(mean, axis=-1).astype(jnp.int32)
                    return labels, mean, var

            else:
                def forward(variables, images):
                    logits = self.module.apply(variables, images, False)
                    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
                    return jnp.argmax(probs, axis=-1).astype(jnp.int32), probs

        else:
            self.resolution = STAGE_RESOLUTIONS[self.stage]
            self.module = STAGE_MODELS[self.stage](
                num_classes=num_classes, dtype=dtype, use_bn=not fold_bn
            )
            template_module = STAGE_MODELS[self.stage](
                num_classes=num_classes, dtype=dtype
            )
            template = template_module.init(
                jax.random.key(0),
                jnp.zeros((1, self.resolution, self.resolution, 3)),
                False,
            )
            variables = load_checkpoint(checkpoint, variables_template=template)[0]
            if fold_bn or quantize:  # quantization requires folded convs
                from ugpg_tpu.models.folding import fold_batchnorm

                variables = fold_batchnorm(variables)
            emit_unc = emit_uncertainty
            n_outputs = 3

            if quantize:
                from ugpg_tpu.ops.quant import (
                    calibrate,
                    quantize_weights,
                    quantized_forward,
                )

                if calibration_batches is None:
                    calibration_batches = [
                        jax.random.uniform(
                            jax.random.key(7),
                            (8, self.resolution, self.resolution, 3),
                        )
                    ]
                scales = calibrate(variables, self.stage, calibration_batches)
                variables = quantize_weights(variables, self.stage, scales)
                stage = self.stage

                def forward(qparams, images):
                    logits = quantized_forward(qparams, scales, stage, images)
                    probs = jax.nn.sigmoid(logits)
                    preds = (probs > threshold).astype(pred_dtype)
                    unc = binary_uncertainty(probs) if emit_unc else jnp.zeros_like(probs)
                    return preds, probs.astype(map_dtype), unc.astype(map_dtype)

            else:
                def forward(variables, images):
                    logits = self.module.apply(variables, images, False)
                    probs = jax.nn.sigmoid(logits)
                    preds = (probs > threshold).astype(pred_dtype)
                    unc = binary_uncertainty(probs) if emit_unc else jnp.zeros_like(probs)
                    return preds, probs.astype(map_dtype), unc.astype(map_dtype)

        if self._shard_model:
            # TP layout: wide conv kernels over 'model', rest replicated —
            # the same partitioning the trainers use
            from ugpg_tpu.parallel.mesh import param_shardings

            self._var_sharding = param_shardings(variables, mesh, True)
        self.variables = jax.device_put(
            variables,
            *([] if self._var_sharding is None else [self._var_sharding]),
        )
        self._n_outputs = n_outputs
        res = self.resolution

        in_dtype = self.input_dtype

        def entry(variables, raw):
            x = raw.astype(jnp.float32)
            if in_dtype == jnp.dtype(jnp.uint8):
                x = x / 255.0
            x = resize_bilinear_align_corners(x, (res, res))
            return forward(variables, x)

        # AOT compile one executable per bucket (resize + scale fused in):
        # no first-request latency
        self._entry = entry
        self._compile_buckets(entry, res, in_dtype)

    def _compile_buckets(self, entry, res, in_dtype) -> None:
        self._compiled = {}
        if self._batch_sharding is not None:
            # one GSPMD program per bucket: batch over 'data', weights
            # replicated, outputs gathered with the same batch sharding
            jitted = jax.jit(
                entry,
                in_shardings=(self._var_sharding, self._batch_sharding),
                out_shardings=self._batch_sharding,
            )
        else:
            jitted = jax.jit(entry)
        for b in self.buckets:
            shape = jax.ShapeDtypeStruct((b, res, res, 3), in_dtype)
            self._compiled[b] = jitted.lower(self.variables, shape).compile()

    # ------------------------------------------------------------------
    # request routing / coercion / __call__ come from _BucketRouter
    # (eval/exported.py — shared with ExportedPredictor)
    def _dispatch(self, bucket: int, chunk):
        if self._batch_sharding is not None:
            # host chunk straight to its per-chip shards (no single-device
            # staging hop)
            chunk = jax.device_put(np.asarray(chunk), self._batch_sharding)
        return self._compiled[bucket](self.variables, chunk)

    def export(self, path, platforms: Sequence[str] = ("cpu", "tpu")):
        """Serialize this predictor as a self-contained serving artifact.

        Writes one multi-platform StableHLO module per bucket — weights
        (incl. folded-BN or int8-quantized parameters) baked in as
        constants — plus a ``manifest.json``.  ``ExportedPredictor(path)``
        serves the artifact with NO model code, checkpoint, or flax
        dependency: ``jax.export``'s versioned StableHLO carries the
        compatibility guarantees, and the default ``platforms`` lower the
        same artifact for both CPU and TPU regardless of the exporting
        host.  Outputs are bit-identical to this predictor's
        (tests/test_export.py).
        """
        import json
        from pathlib import Path

        from jax import export as jexport

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        variables, entry = self.variables, self._entry
        if self.mesh is not None:
            # artifacts are single-device modules (the importer picks its
            # own distribution); pull the replicated weights to host so the
            # baked constants carry no mesh/sharding
            variables = jax.device_get(variables)
        fn = jax.jit(lambda raw: entry(variables, raw))
        res = self.resolution
        for b in self.buckets:
            shape = jax.ShapeDtypeStruct((b, res, res, 3), self.input_dtype)
            exp = jexport.export(fn, platforms=list(platforms))(shape)
            (path / f"bucket_{b}.stablehlo").write_bytes(exp.serialize())
        manifest = {
            "format_version": 1,
            "task_type": self.task_type,
            "stage": self.stage,
            "resolution": self.resolution,
            "buckets": list(self.buckets),
            "input_dtype": self.input_dtype.name,
            "n_outputs": self._n_outputs,
            "platforms": list(platforms),
            "jax_version": jax.__version__,
        }
        (path / "manifest.json").write_text(json.dumps(manifest, indent=1))
        return path

    def stream(self, batches: Iterator[np.ndarray], prefetch: int = 2):
        """Yield predictions for an iterator of image batches, with the
        host->HBM copy of batch k+1 overlapped with compute of batch k."""
        from ugpg_tpu.data.loader import prefetch_to_device

        top = self.batch_size

        def as_device_batches():
            for b in batches:
                b = self._coerce(b)
                n = b.shape[0]
                if n < top:
                    b = np.concatenate(
                        [b, np.zeros((top - n, *b.shape[1:]), b.dtype)]
                    )
                yield (b, n)

        # under a mesh, prefetch straight to the per-chip shards — the
        # default device_put would stage the WHOLE bucket in chip 0's HBM
        # and every call would then reshard it device-to-device
        put = None
        if self._batch_sharding is not None:
            put = lambda t: (jax.device_put(t[0], self._batch_sharding), t[1])

        for device_batch, n in prefetch_to_device(
            as_device_batches(), size=prefetch, put=put
        ):
            outs = self._compiled[top](self.variables, device_batch)
            yield tuple(np.asarray(o[: int(n)]) for o in outs)


class BatchingServer:
    """Deadline-bounded dynamic micro-batcher over a ``Predictor``.

    ``submit(image)`` returns a ``concurrent.futures.Future`` immediately;
    a background worker coalesces queued requests into one device call when
    either (a) the largest bucket fills, or (b) the oldest queued request
    has waited ``max_latency_ms``.  Per-request results resolve on the
    futures (a tuple of per-output arrays for that single image).
    """

    def __init__(self, predictor: Predictor, max_latency_ms: float = 5.0):
        self.predictor = predictor
        self.max_latency_s = max_latency_ms / 1e3
        self._q: queue.Queue = queue.Queue()
        self._closed = False
        self._submit_lock = threading.Lock()
        self._n_submitted = 0
        self._n_groups = 0
        self._max_group = 0
        self._worker = threading.Thread(target=self._loop, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        """Coalescing counters: how well concurrent submits share calls."""
        with self._submit_lock:
            groups = self._n_groups
            out = {
                "submitted": self._n_submitted,
                "groups": groups,
                "max_group": self._max_group,
            }
        out["mean_group"] = (
            round(out["submitted"] / groups, 3) if groups else 0.0
        )
        return out

    def submit(self, image: np.ndarray) -> Future:
        """image: (H, W, 3) float32 in [0,1] or uint8 RGB."""
        image = np.asarray(image)
        if image.ndim != 3 or image.shape[-1] != 3:
            raise ValueError(f"expected one (H, W, 3) image, got {image.shape}")
        fut: Future = Future()
        # lock orders the closed-check and the enqueue against close():
        # without it a submit could land behind the shutdown sentinel and
        # its future would never resolve
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._n_submitted += 1
            self._q.put((image, fut))
        return fut

    def close(self):
        """Drain outstanding requests, then stop the worker."""
        with self._submit_lock:
            self._closed = True
            self._q.put(None)
        self._worker.join()
        # resolve any request that raced the shutdown sentinel
        while True:
            try:
                item = self._q.get_nowait()
            except queue.Empty:
                break
            if item is None:
                continue
            image, fut = item
            with self._submit_lock:
                self._n_groups += 1
                self._max_group = max(self._max_group, 1)
            try:
                outs = self.predictor(image[None])
                fut.set_result(tuple(o[0] for o in outs))
            except Exception as exc:
                fut.set_exception(exc)

    # ------------------------------------------------------------------
    def _collect(self):
        """Block for the first request, then gather more until the largest
        bucket fills or the deadline passes.  Returns (items, saw_sentinel)."""
        first = self._q.get()
        if first is None:
            return [], True
        items = [first]
        cap = self.predictor.batch_size
        deadline = time.monotonic() + self.max_latency_s
        saw_sentinel = False
        while len(items) < cap:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:
                saw_sentinel = True
                break
            items.append(nxt)
        return items, saw_sentinel

    def _loop(self):
        while True:
            items, stop = self._collect()
            if items:
                # coerce per item so one malformed request fails only ITS
                # future (and never the worker); survivors batch together
                good = []
                for im, fut in items:
                    try:
                        good.append(
                            (self.predictor._coerce(np.asarray(im)[None])[0],
                             fut)
                        )
                    except Exception as exc:
                        fut.set_exception(exc)
                if good:
                    with self._submit_lock:
                        self._n_groups += 1
                        self._max_group = max(self._max_group, len(good))
                    try:
                        outs = self.predictor(np.stack([g for g, _ in good]))
                        for i, (_, fut) in enumerate(good):
                            fut.set_result(tuple(o[i] for o in outs))
                    except Exception as exc:  # device-side error: the group
                        for _, fut in good:   # shares one inference call
                            fut.set_exception(exc)
            if stop:
                return


class ServingRegistry:
    """Named multi-model serving: one surface over many ``Predictor``s.

    Production deployments serve several checkpoints side by side (stage
    variants, seg + cls, canary vs stable).  The registry owns a
    ``Predictor`` per name plus an optional ``BatchingServer`` front end;
    duplicate names are rejected, shutdown drains cleanly, and registration
    compiles outside the registry lock so live traffic never stalls.

    Example:
        reg = ServingRegistry()
        reg.register("seg_stage4", "out/ug_pgunet_stage4_best",
                     buckets=(1, 64))
        reg.register("cls", "out/herlev_stage4_best",
                     task_type="classification", num_classes=7)
        preds, probs, unc = reg.predict("seg_stage4", images)
        fut = reg.submit("cls", image)           # micro-batched
        reg.close()
    """

    def __init__(self, max_latency_ms: float = 5.0):
        self._max_latency_ms = max_latency_ms
        self._predictors: dict[str, Predictor] = {}
        self._servers: dict[str, BatchingServer] = {}
        self._lock = threading.Lock()

    def register(self, name: str, checkpoint: str, **predictor_kwargs) -> Predictor:
        """Load + AOT-compile a model under ``name``; duplicate names are
        rejected.  Compilation happens OUTSIDE the registry lock so
        registering a new model never stalls live submit() traffic."""
        with self._lock:
            if name in self._predictors:
                raise ValueError(f"model {name!r} already registered")
        p = Predictor(checkpoint, **predictor_kwargs)
        with self._lock:
            if name in self._predictors:  # lost a registration race
                raise ValueError(f"model {name!r} already registered")
            self._predictors[name] = p
        return p

    def register_artifact(self, name: str, path):
        """Register an exported StableHLO artifact under ``name`` — same
        traffic surface (predict/submit), no model code or checkpoint
        needed.  Dispatches on the manifest: bucket artifacts
        (``Predictor.export``) load as ``ExportedPredictor``, slide
        artifacts (``SlidePredictor.export``) as
        ``ExportedSlidePredictor``."""
        import json
        from pathlib import Path

        with self._lock:
            if name in self._predictors:
                raise ValueError(f"model {name!r} already registered")
        manifest = json.loads((Path(path) / "manifest.json").read_text())
        if manifest.get("kind") == "slide":
            from ugpg_tpu.eval.slide import ExportedSlidePredictor

            p = ExportedSlidePredictor(path)
        else:
            p = ExportedPredictor(path)
        with self._lock:
            if name in self._predictors:  # lost a registration race
                raise ValueError(f"model {name!r} already registered")
            self._predictors[name] = p
        return p

    def register_slide(self, name: str, checkpoint: str, **slide_kwargs):
        """Register a native-resolution ``SlidePredictor`` under ``name``:
        arbitrary-size requests run convolutionally on the FULL image
        (spatially sharded under ``mesh=``) instead of being downsized to
        the stage resolution (eval/slide.py).  Same predict surface; the
        micro-batcher is bypassed (different-size slides cannot coalesce)."""
        from ugpg_tpu.eval.slide import SlidePredictor

        with self._lock:
            if name in self._predictors:
                raise ValueError(f"model {name!r} already registered")
        p = SlidePredictor(checkpoint, **slide_kwargs)
        with self._lock:
            if name in self._predictors:  # lost a registration race
                raise ValueError(f"model {name!r} already registered")
            self._predictors[name] = p
        return p

    def names(self) -> list[str]:
        return sorted(self._predictors)

    def _unknown(self, name: str) -> KeyError:
        return KeyError(f"unknown model {name!r}; registered: {self.names()}")

    def get(self, name: str) -> Predictor:
        try:
            return self._predictors[name]
        except KeyError:
            raise self._unknown(name) from None

    def predict(self, name: str, images):
        """Synchronous batch prediction on the named model."""
        return self.get(name)(images)

    def submit(self, name: str, image) -> Future:
        """Micro-batched single-image request (lazy per-model server).

        Robust against a concurrent ``close()``: a server torn down between
        lookup and submit is replaced and the request retried."""
        predictor = self.get(name)
        if not getattr(predictor, "micro_batch", True):
            # slide predictors: different-size images cannot coalesce into
            # one device call — serve directly, still future-shaped
            fut: Future = Future()
            try:
                outs = predictor(np.asarray(image)[None])
                fut.set_result(tuple(o[0] for o in outs))
            except Exception as exc:
                fut.set_exception(exc)
            return fut
        for _ in range(2):
            with self._lock:
                server = self._servers.get(name)
                if server is None:
                    server = BatchingServer(
                        self.get(name), max_latency_ms=self._max_latency_ms
                    )
                    self._servers[name] = server
            try:
                return server.submit(image)
            except RuntimeError:  # server closed under us; replace and retry
                with self._lock:
                    if self._servers.get(name) is server:
                        del self._servers[name]
        raise RuntimeError(f"could not submit to {name!r} (closing repeatedly)")

    def unregister(self, name: str) -> None:
        """Remove a model: drain its micro-batcher, drop the predictor.

        In-flight ``submit`` futures resolve before removal; subsequent
        ``predict``/``submit`` raise KeyError.  The name becomes free for
        re-registration (rollover/canary replacement)."""
        with self._lock:
            if name not in self._predictors:
                raise self._unknown(name)
            # drop both under ONE lock so a concurrent submit cannot
            # recreate a server for a half-removed name
            del self._predictors[name]
            server = self._servers.pop(name, None)
        if server is not None:
            server.close()  # outside the lock: close() blocks on drain

    def replace(self, name: str, checkpoint: str, **predictor_kwargs):
        """Atomically swap the model behind ``name`` (canary promotion).

        The replacement compiles BEFORE the old model is removed, so the
        name never serves errors during the swap; traffic moves to the new
        predictor at the next request."""
        p = Predictor(checkpoint, **predictor_kwargs)
        with self._lock:
            if name not in self._predictors:
                raise self._unknown(name)
            server = self._servers.pop(name, None)
            self._predictors[name] = p
        if server is not None:
            server.close()  # drains futures against the OLD predictor
        return p

    def stats(self) -> dict:
        """Per-model request/latency/coalescing counters."""
        with self._lock:
            predictors = dict(self._predictors)
            servers = dict(self._servers)
        out = {}
        for name, p in predictors.items():
            entry = {"predictor": p.stats()}
            server = servers.get(name)
            if server is not None:
                entry["batcher"] = server.stats()
            out[name] = entry
        return out

    def close(self):
        """Drain and stop all micro-batchers (predictors stay usable)."""
        with self._lock:
            servers, self._servers = dict(self._servers), {}
        for server in servers.values():
            server.close()

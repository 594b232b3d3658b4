"""Whole-slide (native-resolution) serving.

The reference's deployment-facing inference accepts arbitrary-size images
and lossily downsizes them to the stage resolution before the forward
(ref: MoNuSegImprove/test_monuseg.py:164-201) — a 1000x1000 MoNuSeg slide
loses nuclei-scale detail.  ``SlidePredictor`` serves segmentation at
NATIVE resolution instead: the request is zero-padded up to the model's
divisibility constraint, run convolutionally on the full image — spatially
sharded over a device mesh with 1-px halo exchange when slides exceed one
chip's activation memory (parallel/spatial.py), unsharded otherwise — and
the (preds, probs, uncertainty) maps are cropped back to the request size.

Numerics are identical to ``MoNuSegEvaluator.evaluate_dataset_native``:
under a mesh this calls the same memoized ``spatial_predict`` program with
the same padding, and without one it runs the same padded
``module.apply(..., train=False)`` forward (tests/test_slide_serving.py
asserts exact agreement with both, and with the unsharded forward on a
fake 8-device mesh).

Shapes and recompiles: every distinct padded (H, W) compiles once (static
shapes — the XLA contract).  Slide corpora are near-uniform in size
(MoNuSeg: all 1000x1000), so this is one compile in practice;
``pad_multiple=N`` additionally quantizes request sizes up to multiples of
N to bound the compile count for mixed-size traffic.  Note the multi-scale
heads interpolate at the PADDED size, so a different ``pad_multiple``
changes boundary-region values by interpolation round-off — leave it unset
for bit-parity with the eval path.

``SlidePredictor.export`` writes per-size StableHLO artifacts (weights
baked in) served by ``ExportedSlidePredictor`` with no model code —
the slide analog of ``Predictor.export`` / ``ExportedPredictor``.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.eval.exported import _BucketRouter
from ugpg_tpu.io.checkpoint import load_checkpoint, sniff_stage
from ugpg_tpu.models.pgunet import STAGE_MODELS
from ugpg_tpu.uncertainty import binary_uncertainty

__all__ = ["SlidePredictor", "ExportedSlidePredictor"]


def _round_up(n: int, d: int) -> int:
    return d * -(-n // d)


class _SlideBase(_BucketRouter):
    """Request surface shared by the live and exported slide predictors:
    NHWC (or HWC via the HTTP handler) requests of ANY spatial size,
    (preds, probs, uncertainty) responses at the request size.

    ``micro_batch = False``: slides of different sizes cannot coalesce
    into one device call, so the HTTP front end and the registry bypass
    the deadline micro-batcher and serve each request directly.
    """

    task_type = "segmentation"
    micro_batch = False
    resolution = "native"
    buckets: tuple = ()
    input_dtype = jnp.dtype(jnp.float32)
    _n_outputs = 3

    def __init__(self, max_batch: int = 1, compact_output: bool = False):
        _BucketRouter.__init__(self)
        if max_batch < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.max_batch = max_batch
        self.compact_output = compact_output

    # -- input/output coercion ------------------------------------------
    @staticmethod
    def _coerce(images: np.ndarray) -> np.ndarray:
        """(B, H, W, 3) float32 in [0, 1]; uint8 RGB is scaled (the same
        coercion ``MoNuSegEvaluator.evaluate_dataset_native`` applies to
        ``load_raw`` images)."""
        images = np.asarray(images)
        if images.ndim != 4 or images.shape[-1] != 3:
            raise ValueError(
                f"expected a (B, H, W, 3) batch, got shape {images.shape}"
            )
        if images.dtype == np.uint8:
            return images.astype(np.float32) / 255.0
        return np.asarray(images, np.float32)

    def _compact(self, preds, probs, unc):
        if not self.compact_output:
            return preds, probs, unc
        # slide responses are transfer-bound (a 1000x1000 request returns
        # ~12 MB of f32 maps); uint8 preds + f16 maps cut that 2.4x, and
        # f16 is exact to ~5e-4 on [0, 1] maps
        return (
            preds.astype(np.uint8),
            probs.astype(np.float16),
            unc.astype(np.float16),
        )

    def __call__(self, images):
        """images: (B, H, W, 3) float32 in [0,1] or uint8 RGB — ANY (H, W).
        Returns numpy (preds, probs, uncertainty), each (B, H, W, 1) at the
        REQUEST size (no downsizing)."""
        t0 = time.perf_counter()
        images = self._coerce(images)
        outs = [
            self._run(images[s : s + self.max_batch])
            for s in range(0, len(images), self.max_batch)
        ]
        preds, probs, unc = (
            np.concatenate([np.asarray(o[i]) for o in outs])
            for i in range(3)
        )
        result = self._compact(preds, probs, unc)
        self._record(time.perf_counter() - t0, len(images), len(outs))
        return result

    def _run(self, chunk: np.ndarray):
        raise NotImplementedError  # pragma: no cover — subclass dispatch


class SlidePredictor(_SlideBase):
    """Native-resolution segmentation predictor over a checkpoint.

    Example:
        p = SlidePredictor("out/ug_pgunet_stage4_best")
        preds, probs, unc = p(slides)           # (B, 1000, 1000, 3) in/out

        # slides larger than one chip: spatial halo-exchange grid
        mesh = parallel.mesh.make_mesh(n_data=8)
        p = SlidePredictor("out/ug_pgunet_stage4_best", mesh=mesh)

    Parameters
    ----------
    checkpoint : checkpoint dir (stage sniffed from metadata, default 4).
    dtype : compute dtype for the conv stack (None = f32; pass
        ``jnp.bfloat16`` for the TPU throughput path).  BatchNorm stays
        live eval-mode (folding is throughput-neutral — XLA fuses eval BN
        into the conv epilogue; BASELINE.md).
    mesh : optional ``jax.sharding.Mesh`` — H shards over its 'data' axis
        (and W over ``w_axis`` when given) with 1-px halo exchange over
        ICI, so per-chip memory scales as H*W/n_chips.
    w_axis : second mesh axis name to shard W over (e.g. 'model').
    max_batch : slides per device call (default 1 — native-resolution
        activations are where HBM binds; requests larger than this are
        served in chunks).
    pad_multiple : quantize padded sizes up to multiples of N (bounds
        recompiles under mixed-size traffic; see module docstring).
    compact_output : uint8 preds + float16 maps in responses.
    """

    def __init__(
        self,
        checkpoint: str,
        num_classes: int = 1,
        dtype=None,
        mesh=None,
        w_axis: str | None = None,
        max_batch: int = 1,
        pad_multiple: int | None = None,
        compact_output: bool = False,
    ):
        _SlideBase.__init__(self, max_batch, compact_output)
        if num_classes != 1:
            raise ValueError(
                "SlidePredictor is the binary-segmentation slide path "
                f"(num_classes=1), got num_classes={num_classes}"
            )
        self.stage = sniff_stage(checkpoint, default=4)
        self.mesh = mesh
        self._w_axis = w_axis
        self._dtype = dtype
        pools = 1 if self.stage == 1 else self.stage

        if mesh is not None:
            from ugpg_tpu.parallel.spatial import spatial_divisor

            if w_axis is not None and w_axis not in mesh.axis_names:
                raise ValueError(
                    f"w_axis {w_axis!r} is not a mesh axis ({mesh.axis_names})"
                )
            h_div, w_div = spatial_divisor(self.stage, mesh, "data", w_axis)
        else:
            h_div = w_div = 2**pools
        if pad_multiple:
            h_div = math.lcm(h_div, int(pad_multiple))
            w_div = math.lcm(w_div, int(pad_multiple))
        self._divisor = (h_div, w_div)

        self.module = STAGE_MODELS[self.stage](num_classes=1, dtype=dtype)
        res = {1: 32, 2: 64, 3: 128, 4: 256}[self.stage]
        template = self.module.init(
            jax.random.key(0), jnp.zeros((1, res, res, 3)), False
        )
        variables = load_checkpoint(checkpoint, variables_template=template)[0]
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            variables = jax.device_put(
                variables, NamedSharding(mesh, PartitionSpec())
            )
        else:
            variables = jax.device_put(variables)
        self.variables = variables

        if mesh is None:
            module = self.module

            @jax.jit
            def predict(variables, x):
                probs = jax.nn.sigmoid(module.apply(variables, x, False))
                preds = (probs > 0.5).astype(jnp.float32)
                return preds, probs, binary_uncertainty(probs)

            self._predict_unsharded = predict

    def _run(self, chunk: np.ndarray):
        h, w = chunk.shape[1], chunk.shape[2]
        h_div, w_div = self._divisor
        ph, pw = _round_up(h, h_div) - h, _round_up(w, w_div) - w
        x = jnp.asarray(chunk)
        if ph or pw:
            x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
        if self.mesh is not None:
            from ugpg_tpu.parallel.spatial import spatial_predict

            # the SAME memoized program evaluate_dataset_native runs (its
            # pad=True is a no-op on the pre-padded x), so serving and eval
            # are one code path
            preds, probs, unc = spatial_predict(
                self.variables, x, self.mesh, stage=self.stage,
                w_axis=self._w_axis, dtype=self._dtype, pad=True,
            )
        else:
            preds, probs, unc = self._predict_unsharded(self.variables, x)
        if ph or pw:
            preds, probs, unc = (t[:, :h, :w] for t in (preds, probs, unc))
        return preds, probs, unc

    # ------------------------------------------------------------------
    def export(
        self,
        path,
        sizes: Sequence[tuple[int, int]] = ((1024, 1024),),
        platforms: Sequence[str] = ("cpu", "tpu"),
    ):
        """Serialize as a model-code-free slide-serving artifact.

        One versioned StableHLO module per (H, W) in ``sizes`` (weights
        baked in, batch 1, single-device — the importer picks its own
        distribution), plus a manifest.  ``ExportedSlidePredictor(path)``
        routes each request image to the smallest exported size that fits
        (zero-pad up, crop back) — size buckets, the slide analog of
        ``Predictor``'s batch buckets.
        """
        from jax import export as jexport

        path = Path(path)
        path.mkdir(parents=True, exist_ok=True)
        variables = jax.device_get(self.variables)  # strip any mesh layout
        module = self.module
        pools = 1 if self.stage == 1 else self.stage
        div = 2**pools
        sizes = sorted({(int(h), int(w)) for h, w in sizes})
        for h, w in sizes:
            hp, wp = _round_up(h, div), _round_up(w, div)

            def fn(raw, hp=hp, wp=wp, h=h, w=w):
                x = raw
                if (hp, wp) != (h, w):
                    x = jnp.pad(x, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
                probs = jax.nn.sigmoid(module.apply(variables, x, False))
                preds = (probs > 0.5).astype(jnp.float32)
                unc = binary_uncertainty(probs)
                return tuple(t[:, :h, :w] for t in (preds, probs, unc))

            shape = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
            exp = jexport.export(jax.jit(fn), platforms=list(platforms))(shape)
            (path / f"slide_{h}x{w}.stablehlo").write_bytes(exp.serialize())
        manifest = {
            "format_version": 2,
            "kind": "slide",
            "task_type": "segmentation",
            "stage": self.stage,
            "sizes": [list(s) for s in sizes],
            "n_outputs": 3,
            "platforms": list(platforms),
            "jax_version": jax.__version__,
        }
        (path / "manifest.json").write_text(json.dumps(manifest, indent=1))
        return path


class ExportedSlidePredictor(_SlideBase):
    """Serve a ``SlidePredictor.export`` artifact — no model code or
    checkpoint.  Each request image routes to the smallest exported size
    bucket that fits (zero-padded up, outputs cropped back)."""

    def __init__(self, path, compact_output: bool = False):
        from jax import export as jexport

        _SlideBase.__init__(self, max_batch=1, compact_output=compact_output)
        path = Path(path)
        manifest = json.loads((path / "manifest.json").read_text())
        if manifest.get("format_version") != 2 or manifest.get("kind") != "slide":
            raise ValueError(
                "not a slide artifact (need format_version=2, kind='slide'); "
                "use ExportedPredictor for bucket artifacts"
            )
        self.manifest = manifest
        self.stage = manifest["stage"]
        # ascending by area so _size_for picks the tightest fit
        self.sizes = sorted(
            (tuple(s) for s in manifest["sizes"]), key=lambda s: (s[0] * s[1], s)
        )
        self._fns = {
            (h, w): jexport.deserialize(
                (path / f"slide_{h}x{w}.stablehlo").read_bytes()
            )
            for h, w in self.sizes
        }

    def _size_for(self, h: int, w: int) -> tuple[int, int]:
        for sh, sw in self.sizes:
            if h <= sh and w <= sw:
                return sh, sw
        raise ValueError(
            f"request ({h}, {w}) exceeds every exported size {self.sizes}; "
            "re-export with a larger size bucket"
        )

    def _run(self, chunk: np.ndarray):
        h, w = chunk.shape[1], chunk.shape[2]
        sh, sw = self._size_for(h, w)
        x = chunk
        if (sh, sw) != (h, w):
            x = np.pad(chunk, ((0, 0), (0, sh - h), (0, sw - w), (0, 0)))
        preds, probs, unc = self._fns[(sh, sw)].call(x)
        if (sh, sw) != (h, w):
            preds, probs, unc = (t[:, :h, :w] for t in (preds, probs, unc))
        return preds, probs, unc

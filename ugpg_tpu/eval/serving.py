"""Production inference: fixed-shape compiled predictor with padding.

Serving on TPU wants static shapes (one compiled executable), saturated
batches, and no stragglers recompiling.  ``Predictor`` wraps a checkpoint
as exactly that:

* the forward (resize -> model -> sigmoid -> threshold -> uncertainty map)
  is AOT-compiled once per configured batch size via ``jit(...).lower().
  compile()`` — first request pays nothing;
* ragged request batches are padded up to the compiled batch size and the
  padding stripped from the response;
* larger workloads stream in compiled-batch chunks, optionally overlapping
  host->HBM transfer with compute via the double-buffered prefetcher.

The reference has no serving story (per-image Python loop in
test_monuseg.py:164-201); this is the framework-native replacement.
"""

from __future__ import annotations

from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.io.checkpoint import load_checkpoint, sniff_stage
from ugpg_tpu.models.pgunet import STAGE_MODELS, STAGE_RESOLUTIONS
from ugpg_tpu.ops.resize import resize_bilinear_align_corners
from ugpg_tpu.uncertainty import binary_uncertainty

__all__ = ["Predictor"]


class Predictor:
    """Fixed-batch compiled segmentation predictor.

    Example:
        p = Predictor("out/ug_pgunet_stage4_best", batch_size=64)
        preds, probs, unc = p(images)          # any leading batch size
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
    ):
        self.batch_size = batch_size
        self.stage = sniff_stage(checkpoint, default=4)
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
        if fold_bn:
            # fold BN stats into conv weights: smaller weight set, BN-free
            # serving graph (models/folding.py); numerically identical
            from ugpg_tpu.models.folding import fold_batchnorm

            variables = fold_batchnorm(variables)
        self.variables = jax.device_put(variables)
        res = self.resolution
        emit_unc = emit_uncertainty

        def forward(variables, images):
            # images arrive pre-resized to the model resolution (the AOT
            # executable has a fixed input shape; resizing runs in a small
            # per-input-size jit outside)
            logits = self.module.apply(variables, images, False)
            probs = jax.nn.sigmoid(logits)
            preds = (probs > threshold).astype(jnp.float32)
            unc = binary_uncertainty(probs) if emit_unc else jnp.zeros_like(probs)
            return preds, probs, unc

        # AOT compile for the fixed serving shape: no first-request latency
        shape = jax.ShapeDtypeStruct(
            (batch_size, res, res, 3), jnp.float32
        )
        self._compiled = jax.jit(forward).lower(self.variables, shape).compile()
        self._resize = jax.jit(
            lambda x: resize_bilinear_align_corners(x, (res, res))
        )

    # ------------------------------------------------------------------
    def _run_padded(self, chunk: np.ndarray):
        n = chunk.shape[0]
        if n < self.batch_size:
            pad = np.zeros(
                (self.batch_size - n, *chunk.shape[1:]), chunk.dtype
            )
            chunk = np.concatenate([chunk, pad])
        x = self._resize(jnp.asarray(chunk))
        preds, probs, unc = self._compiled(self.variables, x)
        return preds[:n], probs[:n], unc[:n]

    def __call__(self, images: np.ndarray):
        """images: (N, H, W, 3) float32 in [0,1]; any N.  Returns numpy
        (preds, probs, uncertainty) at model resolution."""
        images = np.asarray(images, np.float32)
        outs = [
            self._run_padded(images[s : s + self.batch_size])
            for s in range(0, len(images), self.batch_size)
        ]
        return tuple(
            np.concatenate([np.asarray(o[i]) for o in outs]) for i in range(3)
        )

    def stream(self, batches: Iterator[np.ndarray], prefetch: int = 2):
        """Yield predictions for an iterator of image batches, with the
        host->HBM copy of batch k+1 overlapped with compute of batch k."""
        from ugpg_tpu.data.loader import prefetch_to_device

        def as_device_batches():
            for b in batches:
                b = np.asarray(b, np.float32)
                n = b.shape[0]
                if n < self.batch_size:
                    b = np.concatenate(
                        [b, np.zeros((self.batch_size - n, *b.shape[1:]),
                                     np.float32)]
                    )
                yield (b, n)

        for device_batch, n in prefetch_to_device(
            as_device_batches(), size=prefetch
        ):
            preds, probs, unc = self._compiled(
                self.variables, self._resize(device_batch)
            )
            yield (
                np.asarray(preds[: int(n)]),
                np.asarray(probs[: int(n)]),
                np.asarray(unc[: int(n)]),
            )

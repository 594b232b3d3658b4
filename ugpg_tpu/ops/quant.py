"""Post-training W8A8 int8 quantization for PGUNet inference.

Motivation: flagship stage-4 inference is HBM-bandwidth-bound at bf16
(BASELINE.md roofline: arithmetic intensity ~300 FLOP/B vs the v5e ridge
~480) and the v5e MXU executes int8 x int8 -> int32 natively.  int8
activations halve the conv-path bytes, moving the bound.  Microbenchmarks
(v5e, chained conv stacks at flagship widths, BASELINE.md): int8+requant
epilogue 1.23-1.53x over bf16.

Scheme — standard symmetric post-training quantization:

* BatchNorm is folded first (models/folding.py); quantization sees pure
  conv+bias blocks (ref inference path: test_monuseg.py:164-201 — the
  reference has no quantized path at all; this is a new capability).
* Weights: per-output-channel symmetric int8 — quantized from
  ``W_eff[:, :, c, o] = W[:, :, c, o] * s_in[c]``, i.e. the consumer's
  per-input-channel activation scale is BAKED INTO the weights.  This is
  the load-bearing trick for U-Nets: the two halves of an Up-block concat
  (skip at its producer's scale, upsampled at its own) feed conv1 at
  different scales with zero requantize passes — the scale mismatch is
  absorbed at weight-quantization time, not with an HBM round trip.
* Activations: per-tensor symmetric int8; scales calibrated as the
  running max|x| over a calibration set at every quantization point.
* Each conv's epilogue (per-channel scale + bias + ReLU + requantize) is
  an elementwise chain XLA fuses into the conv output — int32
  accumulators never round-trip to HBM (verified via cost_analysis:
  isolated int8 conv+epilogue accesses exactly half the bytes of its bf16
  twin).
* MaxPool commutes with quantization and runs directly on int8.
* The bilinear 2x upsample inside Up blocks interpolates on dequantized
  bf16 (fractional taps don't exist in int8) and requantizes at its own
  calibrated scale; the f32 multi-scale heads dequantize via a fused bf16
  in-read convert.

The same topology walker runs a float (folded, bf16) forward used both for
calibration (collecting the max|x| statistics) and as a structural
cross-check against the flax modules in tests.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Mapping

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.ops.resize import (
    resize_bilinear_align_corners_nhw,
    upsample2x_bilinear_align_corners,
)

__all__ = [
    "quantize_weights",
    "calibrate",
    "quantized_forward",
    "float_folded_forward",
    "quantize_cls_weights",
    "calibrate_cls",
    "quantized_cls_forward",
    "float_folded_cls_forward",
    "QuantizedModel",
]

# Per-stage topology (mirrors models/pgunet.py): encoder block names in
# order (every block after the first is preceded by a 2x2 maxpool), number
# of Up blocks, head names.  Up block i consumes encoder output
# enc[-2 - i] as its skip.  Stage 1 has a single head on the only decoder
# output; stages 2-4 sum multi-scale heads (head i on decoder output i,
# upsampled to the stage resolution).
_TOPOLOGY = {
    1: (("inc", "down4"), 1, ("outc",)),
    2: (("inc", "down3", "down4"), 2, ("outc1", "outc2")),
    3: (("inc", "down2", "down3", "down4"), 3, ("outc1", "outc2", "outc3")),
    4: (
        ("inc", "down1", "down2", "down3", "down4"),
        4,
        ("outc1", "outc2", "outc3", "outc4"),
    ),
}

_DN = ("NHWC", "HWIO", "NHWC")  # conv dimension numbers


def _block_params(params: Mapping, name: str) -> tuple[dict, dict]:
    """(conv1, conv2) param dicts of an InConv/Down/Up block."""
    block = params[name]["conv"]
    return block["conv1"], block["conv2"]


def _head_params(params: Mapping, name: str) -> tuple[jax.Array, jax.Array]:
    head = params[name]["conv"]
    return head["kernel"], head["bias"]


# ----------------------------------------------------------------------
# Weight quantization


def quantize_weights(
    folded_variables: Mapping[str, Any], stage: int, scales: Mapping[str, float]
) -> dict:
    """Per-output-channel symmetric int8 quantization of every DoubleConv
    kernel in a BN-folded variable tree, with each conv's INPUT activation
    scale(s) baked into the weights (see module docstring).  Head (1x1)
    kernels stay f32 — the precision-critical logits path.

    Returns ``{block: {convN: {"wq": int8 (3,3,in,out), "scale": f32
    (out,), "bias": f32 (out,)}}, "__heads__": {...}}``.
    """
    params = folded_variables["params"]
    enc, n_ups, heads = _TOPOLOGY[stage]
    out: dict[str, Any] = {}

    s_prev = scales["in"]
    for name in enc:
        c1, c2 = _block_params(params, name)
        out[name] = {
            "conv1": _quant_conv(c1, s_prev),
            "conv2": _quant_conv(c2, scales[f"{name}.mid"]),
        }
        s_prev = scales[f"{name}.out"]

    for i in range(n_ups):
        name = f"up{i + 1}"
        skip_name = enc[len(enc) - 2 - i]
        c1, c2 = _block_params(params, name)
        c_skip = _block_params(params, skip_name)[1]["kernel"].shape[-1]
        c_total = c1["kernel"].shape[-2]
        # concat input = [skip at its producer's scale | upsampled at its
        # own]: a per-input-channel scale vector, absorbed into wq
        s_in = np.concatenate([
            np.full(c_skip, scales[f"{skip_name}.out"], np.float32),
            np.full(c_total - c_skip, scales[f"{name}.up"], np.float32),
        ])
        out[name] = {
            "conv1": _quant_conv(c1, s_in),
            "conv2": _quant_conv(c2, scales[f"{name}.mid"]),
        }

    out["__heads__"] = {
        h: {
            "kernel": jnp.asarray(_head_params(params, h)[0], jnp.float32),
            "bias": jnp.asarray(_head_params(params, h)[1], jnp.float32),
        }
        for h in heads
    }
    return out


def _quant_conv(conv: Mapping[str, jax.Array], s_in) -> dict:
    """int8-quantize one conv kernel with the input scale(s) pre-applied.

    ``s_in``: scalar or (in_channels,) vector; ``W_eff = W * s_in[c]`` so
    ``conv_i8(xq, wq) * scale_o + bias == conv(x, W) + bias`` exactly
    (modulo int8 rounding) with NO input-scale factor in the epilogue.
    """
    k = jnp.asarray(conv["kernel"], jnp.float32)
    s_in = jnp.asarray(s_in, jnp.float32)
    if s_in.ndim == 1:
        k = k * s_in[None, None, :, None]
    else:
        k = k * s_in
    scale = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0  # (out,)
    scale = jnp.maximum(scale, 1e-12)
    wq = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    return {"wq": wq, "scale": scale, "bias": jnp.asarray(conv["bias"], jnp.float32)}


# ----------------------------------------------------------------------
# Shared topology walker


def _conv_i8(xq: jax.Array, wq: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        xq, wq, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=_DN, preferred_element_type=jnp.int32,
    )


def _requant(f: jax.Array, scale) -> jax.Array:
    return jnp.clip(jnp.round(f / scale), -127, 127).astype(jnp.int8)


def _qblock(xq, qp, s_mid, s_out):
    """int8 DoubleConv: conv -> fused scale+bias+ReLU+requant epilogue x2.

    Input scales are baked into ``wq`` (quantize_weights), so the epilogue
    is purely per-output-channel.  Returns the block output at ``s_out``.
    """
    y = _conv_i8(xq, qp["conv1"]["wq"]).astype(jnp.float32)
    f = jnp.maximum(y * qp["conv1"]["scale"] + qp["conv1"]["bias"], 0.0)
    xq2 = _requant(f, s_mid)
    y2 = _conv_i8(xq2, qp["conv2"]["wq"]).astype(jnp.float32)
    f2 = jnp.maximum(y2 * qp["conv2"]["scale"] + qp["conv2"]["bias"], 0.0)
    return _requant(f2, s_out)


def _fblock(x, p1, p2, dtype):
    """Float (folded) DoubleConv used for calibration / cross-checking."""
    k1 = p1["kernel"].astype(dtype)
    k2 = p2["kernel"].astype(dtype)
    y = jax.lax.conv_general_dilated(x, k1, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN)
    mid = jnp.maximum(y + p1["bias"].astype(dtype), 0)
    y2 = jax.lax.conv_general_dilated(mid, k2, (1, 1), ((1, 1), (1, 1)), dimension_numbers=_DN)
    return mid, jnp.maximum(y2 + p2["bias"].astype(dtype), 0)


def _pool(x):
    from flax import linen as nn

    return nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))


def _heads_sum(feats, heads, head_params, res):
    """f32 multi-scale head sum; channel-squeezed (N,H,W) for K==1 (the
    TPU-friendly tiling, see blocks._Head1x1), (N,H,W,K) otherwise.

    ``feats``: per-head (dequantized f32 or float) decoder features.
    Returns (N,H,W,K).
    """
    from ugpg_tpu.ops.resize import resize_bilinear_align_corners

    total = None
    for h, x in zip(heads, feats):
        k = head_params[h]["kernel"]
        b = head_params[h]["bias"]
        # bf16 feats (quantized path): contract in bf16 with f32
        # accumulation so the in-read convert fuses; f32 feats (float
        # walker) contract in full precision, matching blocks._Head1x1.
        if x.dtype == jnp.bfloat16:
            kw = dict(preferred_element_type=jnp.float32)
            cast = jnp.bfloat16
        else:
            kw = {}
            cast = jnp.float32
            x = x.astype(jnp.float32)
        if k.shape[-1] == 1:
            o = jnp.einsum("nhwc,c->nhw", x, k[0, 0, :, 0].astype(cast), **kw) + b[0]
            if o.shape[1] != res:
                o = resize_bilinear_align_corners_nhw(o, (res, res))
        else:
            o = jnp.einsum("nhwc,co->nhwo", x, k[0, 0].astype(cast), **kw) + b
            if o.shape[1] != res:
                o = resize_bilinear_align_corners(o, (res, res))
        total = o if total is None else total + o
    return total[..., None] if total.ndim == 3 else total


def float_folded_forward(folded_variables, stage: int, x, dtype=jnp.bfloat16):
    """Folded float forward through the walker (single-class heads).

    Returns ``(logits (N,H,W,1), amax)`` where ``amax`` maps every
    quantization point to max|x| over this batch — reduce with
    ``jnp.maximum`` across calibration batches, then divide by 127 for the
    activation scales.
    """
    params = folded_variables["params"]
    enc, n_ups, heads = _TOPOLOGY[stage]
    amax: dict[str, jax.Array] = {"in": jnp.max(jnp.abs(x))}
    x = x.astype(dtype)

    enc_out = []
    cur = x
    for i, name in enumerate(enc):
        if i > 0:
            cur = _pool(cur)
        p1, p2 = _block_params(params, name)
        mid, cur = _fblock(cur, p1, p2, dtype)
        amax[f"{name}.mid"] = jnp.max(mid).astype(jnp.float32)
        amax[f"{name}.out"] = jnp.max(cur).astype(jnp.float32)
        enc_out.append(cur)

    dec_out = []
    for i in range(n_ups):
        name = f"up{i + 1}"
        skip = enc_out[len(enc) - 2 - i]
        up = upsample2x_bilinear_align_corners(cur)
        amax[f"{name}.up"] = jnp.max(jnp.abs(up)).astype(jnp.float32)
        cat = jnp.concatenate([skip, up], axis=-1)
        p1, p2 = _block_params(params, name)
        mid, cur = _fblock(cat, p1, p2, dtype)
        amax[f"{name}.mid"] = jnp.max(mid).astype(jnp.float32)
        amax[f"{name}.out"] = jnp.max(cur).astype(jnp.float32)
        dec_out.append(cur)

    head_params = {
        h: {"kernel": _head_params(params, h)[0], "bias": _head_params(params, h)[1]}
        for h in heads
    }
    res = dec_out[-1].shape[1]
    logits = _heads_sum(dec_out, heads, head_params, res)
    return logits, amax


def quantized_forward(qparams, scales: Mapping[str, float], stage: int, x):
    """W8A8 int8 forward.  ``x`` is the f32 input in its native range;
    ``scales`` maps every quantization point (see ``float_folded_forward``)
    to its activation scale (maxabs/127)."""
    enc, n_ups, heads = _TOPOLOGY[stage]
    xq = _requant(x.astype(jnp.float32), scales["in"])

    enc_out = []  # int8 tensors, each at its block's ".out" scale
    cur = xq
    s_cur = scales["in"]
    for i, name in enumerate(enc):
        if i > 0:
            cur = _pool(cur)  # int8 maxpool; scale unchanged
        cur = _qblock(cur, qparams[name],
                      scales[f"{name}.mid"], scales[f"{name}.out"])
        s_cur = scales[f"{name}.out"]
        enc_out.append(cur)

    dec_out = []  # (int8, scale)
    for i in range(n_ups):
        name = f"up{i + 1}"
        skip = enc_out[len(enc) - 2 - i]
        # fractional bilinear taps need real arithmetic: dequantize the
        # upsampled half to bf16, interpolate, requantize at its own
        # calibrated scale.  (An int8 fixed-point upsample — quantized
        # interpolation matrices, int8xint8->int32 einsums — was measured
        # WORSE: 33.2 vs 27.7 GB/step; the int32 einsum outputs
        # materialize before the requant fuses.  See BASELINE.md.)  The
        # skip half concatenates AS IS — its scale difference is baked
        # into conv1's weights (quantize_weights), so no requantize pass
        # touches it.
        up_f = upsample2x_bilinear_align_corners(
            cur.astype(jnp.bfloat16) * jnp.bfloat16(s_cur)
        )
        up_q = _requant(up_f.astype(jnp.float32), scales[f"{name}.up"])
        cat = jnp.concatenate([skip, up_q], axis=-1)
        cur = _qblock(cat, qparams[name],
                      scales[f"{name}.mid"], scales[f"{name}.out"])
        s_cur = scales[f"{name}.out"]
        dec_out.append((cur, s_cur))

    res = dec_out[-1][0].shape[1]
    # dequantize head inputs with a bf16 in-read convert (fuses into the
    # head contraction; f32 would double the read bytes)
    feats = [q.astype(jnp.bfloat16) * jnp.bfloat16(s) for q, s in dec_out]
    return _heads_sum(feats, heads, qparams["__heads__"], res)


# ----------------------------------------------------------------------
# Classification (Herlev) variant: the PGUNet encoder walk is the compute
# (inc + down blocks to the 512-ch map, ref: train_herlev.py:83-102); the
# f32 GAP + 3-layer MLP head is negligible and precision-critical, so only
# the encoder quantizes.  Encoder params live under the "unet" scope
# (models/classifier.py).


def _cls_block_names(stage: int):
    from ugpg_tpu.models.classifier import _ENCODER_SPECS

    _, downs = _ENCODER_SPECS[stage]
    return ["inc"] + [name for name, _ in downs]


def quantize_cls_weights(
    folded_variables: Mapping[str, Any], stage: int, scales: Mapping[str, float]
) -> dict:
    """int8-quantize the classifier's encoder convs (input scales baked
    in); the MLP head tensors stay f32."""
    params = folded_variables["params"]
    enc = params["unet"]
    out: dict[str, Any] = {}
    s_prev = scales["in"]
    for name in _cls_block_names(stage):
        c1, c2 = _block_params(enc, name)
        out[name] = {
            "conv1": _quant_conv(c1, s_prev),
            "conv2": _quant_conv(c2, scales[f"{name}.mid"]),
        }
        s_prev = scales[f"{name}.out"]
    out["__head__"] = {
        k: jax.tree.map(lambda v: jnp.asarray(v, jnp.float32), dict(params[k]))
        for k in ("fc1", "fc2", "fc3")
    }
    return out


def float_folded_cls_forward(folded_variables, stage: int, x, dtype=jnp.bfloat16):
    """Folded float classifier forward; returns (logits (N, K), amax)."""
    params = folded_variables["params"]
    enc = params["unet"]
    amax: dict[str, jax.Array] = {"in": jnp.max(jnp.abs(x))}
    cur = x.astype(dtype)
    for i, name in enumerate(_cls_block_names(stage)):
        if i > 0:
            cur = _pool(cur)
        p1, p2 = _block_params(enc, name)
        mid, cur = _fblock(cur, p1, p2, dtype)
        amax[f"{name}.mid"] = jnp.max(mid).astype(jnp.float32)
        amax[f"{name}.out"] = jnp.max(cur).astype(jnp.float32)
    h = jnp.mean(cur.astype(jnp.float32), axis=(1, 2))
    return _mlp_head(params, h), amax


def _mlp_head(params, h):
    h = jax.nn.relu(h @ params["fc1"]["kernel"] + params["fc1"]["bias"])
    h = jax.nn.relu(h @ params["fc2"]["kernel"] + params["fc2"]["bias"])
    return h @ params["fc3"]["kernel"] + params["fc3"]["bias"]


def quantized_cls_forward(qparams, scales: Mapping[str, float], stage: int, x):
    """W8A8 int8 classifier forward: int8 encoder, f32 GAP + MLP head."""
    cur = _requant(x.astype(jnp.float32), scales["in"])
    s_cur = scales["in"]
    for i, name in enumerate(_cls_block_names(stage)):
        if i > 0:
            cur = _pool(cur)
        cur = _qblock(cur, qparams[name],
                      scales[f"{name}.mid"], scales[f"{name}.out"])
        s_cur = scales[f"{name}.out"]
    # GAP with the dequant fused into the reduction read
    h = jnp.mean(cur.astype(jnp.float32), axis=(1, 2)) * s_cur
    return _mlp_head(qparams["__head__"], h)


def calibrate_cls(folded_variables, stage: int, batches, dtype=jnp.bfloat16) -> dict:
    fwd = jax.jit(partial(float_folded_cls_forward, stage=stage, dtype=dtype))
    running: dict[str, float] = {}
    for batch in batches:
        _, amax = fwd(folded_variables, x=jnp.asarray(batch))
        amax = jax.device_get(amax)
        for k, v in amax.items():
            running[k] = max(running.get(k, 0.0), float(v))
    return {k: max(v, 1e-12) / 127.0 for k, v in running.items()}


# ----------------------------------------------------------------------
# High-level API


def calibrate(folded_variables, stage: int, batches, dtype=jnp.bfloat16) -> dict:
    """Run the float folded forward over calibration batches; return the
    activation-scale dict (python floats — they become compile-time
    constants of the quantized executable)."""
    fwd = jax.jit(partial(float_folded_forward, stage=stage, dtype=dtype),
                  static_argnames=())
    running: dict[str, float] = {}
    for batch in batches:
        _, amax = fwd(folded_variables, x=jnp.asarray(batch))
        amax = jax.device_get(amax)
        for k, v in amax.items():
            running[k] = max(running.get(k, 0.0), float(v))
    return {k: max(v, 1e-12) / 127.0 for k, v in running.items()}


class QuantizedModel:
    """Calibrated W8A8 PGUNet stage: ``model(x) -> logits``.

    Build with ``QuantizedModel.from_variables(variables, stage,
    calibration_batches)`` from a live (un-folded) variable tree; BN
    folding, weight quantization, and activation calibration happen here.
    """

    def __init__(self, qparams, scales, stage: int):
        self.qparams = qparams
        self.scales = dict(scales)
        self.stage = stage
        # scales close over the jit as python floats — compile-time
        # constants, so the requant divisions fold into the conv epilogues
        # (passing them as arguments would make every scale a traced
        # operand); qparams stay a runtime argument (weight arrays must
        # not be baked into the executable)
        self._fwd = jax.jit(
            lambda qparams, x: quantized_forward(qparams, self.scales, stage, x)
        )

    @classmethod
    def from_variables(cls, variables, stage: int, calibration_batches):
        from ugpg_tpu.models.folding import fold_batchnorm

        folded = fold_batchnorm(variables)
        scales = calibrate(folded, stage, calibration_batches)
        return cls(quantize_weights(folded, stage, scales), scales, stage)

    def __call__(self, x) -> jax.Array:
        return self._fwd(self.qparams, x)

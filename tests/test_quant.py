"""W8A8 post-training quantization (ops/quant.py).

The float topology walker must match the flax modules exactly (it is the
calibration path), and the int8 forward must track the float logits to
quantization noise.  Resolutions are reduced (the walker is
resolution-agnostic) to keep CPU CI time bounded.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ugpg_tpu.models.folding import fold_batchnorm
from ugpg_tpu.models.pgunet import STAGE_MODELS
from ugpg_tpu.ops.quant import (
    QuantizedModel,
    calibrate,
    float_folded_forward,
    quantize_weights,
    quantized_forward,
)


def _setup(stage, res, num_classes=1, seed=0):
    rng = np.random.default_rng(seed)
    module = STAGE_MODELS[stage](num_classes=num_classes)
    x = jnp.asarray(rng.random((2, res, res, 3)), jnp.float32)
    variables = module.init(jax.random.key(seed), x, False)
    folded = fold_batchnorm(variables)
    mod_folded = STAGE_MODELS[stage](num_classes=num_classes, use_bn=False)
    ref = mod_folded.apply(folded, x, False)
    return variables, folded, x, ref


@pytest.mark.parametrize("stage,res", [(1, 32), (2, 32), (3, 32), (4, 32)])
def test_float_walker_matches_module(stage, res):
    _, folded, x, ref = _setup(stage, res)
    got, amax = float_folded_forward(folded, stage, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    assert all(float(v) >= 0 for v in jax.device_get(amax).values())


@pytest.mark.parametrize(
    "stage,res",
    [pytest.param(1, 32, marks=pytest.mark.slow), (4, 32)],
)
def test_quantized_forward_tracks_float(stage, res):
    _, folded, x, ref = _setup(stage, res)
    scales = calibrate(folded, stage, [x], dtype=jnp.float32)
    qp = quantize_weights(folded, stage, scales)
    ql = quantized_forward(qp, scales, stage, x)
    assert ql.shape == ref.shape
    err = np.asarray(ql) - np.asarray(ref)
    ref_std = float(np.std(np.asarray(ref))) + 1e-12
    assert float(np.sqrt(np.mean(err**2))) < 0.2 * ref_std + 1e-4
    # thresholded predictions agree except near the decision boundary
    pf = np.asarray(jax.nn.sigmoid(ref)) > 0.5
    pq = np.asarray(jax.nn.sigmoid(ql)) > 0.5
    away = np.abs(np.asarray(jax.nn.sigmoid(ref)) - 0.5) > 1e-3
    assert np.mean((pf == pq) | ~away) > 0.999


def test_quantized_weights_are_int8_with_baked_scales():
    _, folded, x, _ = _setup(2, 32)
    scales = calibrate(folded, 2, [x], dtype=jnp.float32)
    qp = quantize_weights(folded, 2, scales)
    for name in ("inc", "down3", "down4", "up1", "up2"):
        for conv in ("conv1", "conv2"):
            assert qp[name][conv]["wq"].dtype == jnp.int8
            assert qp[name][conv]["scale"].ndim == 1
            assert int(jnp.max(jnp.abs(qp[name][conv]["wq"]))) <= 127
    # dequantized conv1 of up1 must reproduce W * s_in per input channel:
    # the skip half (down3 out scale) differs from the upsampled half
    assert scales["down3.out"] != scales["up1.up"]


def test_quantized_model_api_multiclass():
    variables, _, x, _ = _setup(2, 32, num_classes=3)
    qm = QuantizedModel.from_variables(variables, 2, [x])
    out = qm(x)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == jnp.float32


@pytest.mark.slow
def test_predictor_quantize_roundtrip(tmp_path):
    from ugpg_tpu.eval.serving import Predictor
    from ugpg_tpu.io.checkpoint import save_checkpoint

    rng = np.random.default_rng(3)
    module = STAGE_MODELS[1](num_classes=1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(1), x, False)
    ckpt = tmp_path / "ug_pgunet_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})

    pf = Predictor(str(ckpt), buckets=(2,), dtype=None)
    pq = Predictor(str(ckpt), buckets=(2,), dtype=None, quantize=True,
                   calibration_batches=[np.asarray(x)])
    preds_f, probs_f, unc_f = pf(np.asarray(x))
    preds_q, probs_q, unc_q = pq(np.asarray(x))
    assert preds_q.shape == preds_f.shape
    np.testing.assert_allclose(probs_q, probs_f, atol=5e-3)
    np.testing.assert_allclose(unc_q, unc_f, atol=2e-2)


@pytest.mark.slow
def test_predictor_quantize_composes_with_uint8_requests(tmp_path):
    """Raw uint8 request executables and the int8 path compose: the /255
    scaling fuses ahead of the input quantization."""
    import jax.numpy as jnp

    from ugpg_tpu.eval.serving import Predictor
    from ugpg_tpu.io.checkpoint import save_checkpoint

    rng = np.random.default_rng(5)
    module = STAGE_MODELS[1](num_classes=1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(1), x, False)
    ckpt = tmp_path / "ug_pgunet_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})

    p8 = Predictor(str(ckpt), buckets=(2,), dtype=None, quantize=True,
                   input_dtype=jnp.uint8, calibration_batches=[np.asarray(x)])
    pf = Predictor(str(ckpt), buckets=(2,), dtype=None, quantize=True,
                   calibration_batches=[np.asarray(x)])
    raw = (np.asarray(x) * 255).astype(np.uint8)
    preds8, probs8, _ = p8(raw)
    predsf, probsf, _ = pf(raw.astype(np.float32) / 255.0)
    np.testing.assert_allclose(probs8, probsf, atol=5e-3)
    assert preds8.shape == predsf.shape


def test_predictor_quantize_requires_calibration_and_warns_off128(
    tmp_path, monkeypatch
):
    """Guardrails: quantize=True must not silently calibrate on random data,
    and off-128 throughput buckets (measured to INVERT the int8 advantage,
    BASELINE.md batch-size sensitivity) must warn.

    The per-bucket AOT compile is stubbed out — this test checks the
    constructor's guardrail SEMANTICS only; quantized numerics/serving are
    covered by test_quantized_forward_tracks_float and the slow-marked
    Predictor round-trip tests."""
    import warnings

    from ugpg_tpu.eval import serving
    from ugpg_tpu.eval.serving import Predictor
    from ugpg_tpu.io.checkpoint import save_checkpoint

    monkeypatch.setattr(
        serving.Predictor, "_compile_buckets",
        lambda self, entry, res, in_dtype: setattr(self, "_compiled", {}),
    )

    rng = np.random.default_rng(9)
    module = STAGE_MODELS[1](num_classes=1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(1), x, False)
    ckpt = tmp_path / "ug_pgunet_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})

    with pytest.raises(ValueError, match="calibration_batches"):
        Predictor(str(ckpt), buckets=(2,), dtype=None, quantize=True)

    with pytest.warns(UserWarning, match="128"):
        Predictor(str(ckpt), buckets=(64,), dtype=None, quantize=True,
                  calibration_batches=[np.asarray(x)])

    # small latency buckets and 128-multiples stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        Predictor(str(ckpt), buckets=(2,), dtype=None, quantize=True,
                  calibration_batches=[np.asarray(x)])


def _cls_setup(stage, res, num_classes=7, seed=0):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    rng = np.random.default_rng(seed)
    module = HerlevClassificationModel(stage=stage, num_classes=num_classes)
    x = jnp.asarray(rng.random((3, res, res, 3)), jnp.float32)
    variables = module.init(jax.random.key(seed), x, False)
    ref = module.apply(variables, x, False)  # eval == folded eval
    return variables, fold_batchnorm(variables), x, ref


@pytest.mark.parametrize("stage,res", [(1, 32), (3, 32)])
def test_cls_float_walker_matches_module(stage, res):
    from ugpg_tpu.ops.quant import float_folded_cls_forward

    _, folded, x, ref = _cls_setup(stage, res)
    got, amax = float_folded_cls_forward(folded, stage, x, dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    assert "in" in amax and f"inc.out" in amax


def test_cls_quantized_tracks_float():
    from ugpg_tpu.ops.quant import (
        calibrate_cls,
        quantize_cls_weights,
        quantized_cls_forward,
    )

    _, folded, x, ref = _cls_setup(2, 32)
    scales = calibrate_cls(folded, 2, [x], dtype=jnp.float32)
    qp = quantize_cls_weights(folded, 2, scales)
    ql = quantized_cls_forward(qp, scales, 2, x)
    assert ql.shape == ref.shape
    err = np.asarray(ql) - np.asarray(ref)
    ref_std = float(np.std(np.asarray(ref))) + 1e-12
    assert float(np.sqrt(np.mean(err**2))) < 0.25 * ref_std + 1e-4
    # MLP head weights stayed f32
    assert qp["__head__"]["fc1"]["kernel"].dtype == jnp.float32


@pytest.mark.slow
def test_predictor_quantize_classification(tmp_path):
    from ugpg_tpu.eval.serving import Predictor
    from ugpg_tpu.io.checkpoint import save_checkpoint
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    rng = np.random.default_rng(11)
    module = HerlevClassificationModel(stage=1, num_classes=5)
    x = jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(2), x, False)
    ckpt = tmp_path / "herlev_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})

    pf = Predictor(str(ckpt), task_type="classification", num_classes=5,
                   buckets=(4,), dtype=None)
    pq = Predictor(str(ckpt), task_type="classification", num_classes=5,
                   buckets=(4,), dtype=None, quantize=True,
                   calibration_batches=[np.asarray(x)])
    labels_f, probs_f = pf(np.asarray(x))
    labels_q, probs_q = pq(np.asarray(x))
    assert labels_q.shape == labels_f.shape
    np.testing.assert_allclose(probs_q, probs_f, atol=0.05)

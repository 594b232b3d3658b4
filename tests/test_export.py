"""Exported StableHLO serving artifacts == the live Predictor.

Predictor.export writes per-bucket StableHLO modules (weights baked in) +
manifest; ExportedPredictor serves them with no model code or checkpoint.
Segmentation outputs are bit-identical on the exporting platform (the cls
MLP head's dots track to ~1e-4 rel — lowering-choice noise), and the
routing / coercion semantics (ragged batches, uint8 requests) survive the
round trip.  Exports here use platforms=("cpu",) — the multi-platform ("cpu",
"tpu") default is exercised once (it only adds a second lowering).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.eval.serving import ExportedPredictor, Predictor
from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.pgunet import STAGE_MODELS


@pytest.fixture(scope="module")
def seg_ckpt(tmp_path_factory):
    rng = np.random.default_rng(3)
    module = STAGE_MODELS[1](num_classes=1)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(1), x, False)
    ckpt = tmp_path_factory.mktemp("ck") / "ug_pgunet_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})
    return str(ckpt), np.asarray(x)


def test_export_roundtrip_bit_identical(tmp_path, seg_ckpt):
    ckpt, x = seg_ckpt
    p = Predictor(ckpt, buckets=(2, 4), dtype=None)
    art = p.export(tmp_path / "art", platforms=("cpu",))
    q = ExportedPredictor(art)

    batch = np.concatenate([x, x[::-1]])  # 4 images
    for req in (batch, batch[:3]):  # exact bucket + ragged routing
        got = q(req)
        want = p(req)
        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))

    assert q.manifest["stage"] == 1
    assert q.manifest["task_type"] == "segmentation"
    assert q.buckets == (2, 4) and q.resolution == 32


def test_export_uint8_requests(tmp_path, seg_ckpt):
    ckpt, x = seg_ckpt
    p = Predictor(ckpt, buckets=(2,), dtype=None, input_dtype=jnp.uint8)
    q = ExportedPredictor(p.export(tmp_path / "a8", platforms=("cpu",)))
    raw = (x * 255).astype(np.uint8)
    got = q(raw)
    want = p(raw)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert q.input_dtype == jnp.dtype(jnp.uint8)


def test_export_classification(tmp_path):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    rng = np.random.default_rng(5)
    module = HerlevClassificationModel(stage=1, num_classes=5)
    x = jnp.asarray(rng.random((2, 32, 32, 3)), jnp.float32)
    variables = module.init(jax.random.key(2), x, False)
    ckpt = tmp_path / "herlev_stage1_best"
    save_checkpoint(ckpt, variables, metadata={"stage": 1})

    p = Predictor(str(ckpt), task_type="classification", num_classes=5,
                  buckets=(2,), dtype=None)
    q = ExportedPredictor(p.export(tmp_path / "acls", platforms=("cpu",)))
    labels_q, probs_q = q(np.asarray(x))
    labels_p, probs_p = p(np.asarray(x))
    np.testing.assert_array_equal(labels_q, labels_p)
    # the MLP head's dots pick up different (legal) lowering choices in the
    # deserialized module than in the live jit on CPU — probs track to
    # ~1e-4 rel; the conv path (segmentation test above) is bit-identical
    np.testing.assert_allclose(
        np.asarray(probs_q), np.asarray(probs_p), rtol=1e-3, atol=1e-5
    )


@pytest.mark.slow
def test_export_quantized_artifact(tmp_path, seg_ckpt):
    """The W8A8 int8 serving path exports too: int8 weights + scales are
    baked into the StableHLO as constants, round trip bit-identical.
    Slow-marked (~2 min on 1 CPU core: quantize pipeline + int8 lowering);
    the f32/uint8/cls round trips keep the export mechanism in the default
    suite."""
    ckpt, x = seg_ckpt
    p = Predictor(ckpt, buckets=(2,), dtype=None, quantize=True,
                  calibration_batches=[x])
    q = ExportedPredictor(p.export(tmp_path / "aq", platforms=("cpu",)))
    got = q(x)
    want = p(x)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


def test_exported_predictor_drives_batching_server(tmp_path, seg_ckpt):
    """The dynamic micro-batcher composes with exported artifacts (it only
    needs __call__/batch_size/_coerce, all part of the exported surface)."""
    from ugpg_tpu.eval.serving import BatchingServer

    ckpt, x = seg_ckpt
    p = Predictor(ckpt, buckets=(4,), dtype=None)
    q = ExportedPredictor(p.export(tmp_path / "bs", platforms=("cpu",)))
    server = BatchingServer(q, max_latency_ms=20.0)
    try:
        futures = [server.submit(x[i % 2]) for i in range(4)]
        outs = [f.result(timeout=60) for f in futures]
    finally:
        server.close()
    want = p(x[:1])
    np.testing.assert_array_equal(np.asarray(outs[0][1]),
                                  np.asarray(want[1][0]))


def test_exported_import_is_flax_free():
    """The deployment module must import without flax/the model zoo (the
    package __init__ resolves exports lazily) — checked in a clean
    interpreter since this suite already has flax loaded."""
    import subprocess
    import sys

    code = (
        "import sys; import jax; jax.config.update('jax_platforms','cpu');\n"
        "from ugpg_tpu.eval.exported import ExportedPredictor\n"
        "assert 'flax' not in sys.modules, 'flax leaked'\n"
        "assert 'ugpg_tpu.models.pgunet' not in sys.modules, 'model zoo leaked'\n"
        "print('ok')\n"
    )
    out = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=str(__import__("pathlib").Path(__file__).resolve().parent.parent),
    )
    assert out.returncode == 0 and "ok" in out.stdout, out.stderr[-2000:]


def test_export_cli_quantize_requires_calibration(tmp_path, seg_ckpt):
    from ugpg_tpu.cli.export_model import main

    ckpt, x = seg_ckpt
    with pytest.raises(SystemExit, match="calibration"):
        main(["--model", ckpt, "--out", str(tmp_path / "q"), "--quantize"])


@pytest.mark.slow  # ~60s: int8 quantize + export + serve; quantized
def test_export_cli_quantized_roundtrip(tmp_path, seg_ckpt):  # numerics stay
    from ugpg_tpu.cli.export_model import main  # default-covered (test_quant)

    ckpt, x = seg_ckpt
    np.save(tmp_path / "cal.npy", x)
    main(["--model", ckpt, "--out", str(tmp_path / "q"), "--quantize",
          "--calibration", str(tmp_path / "cal.npy"), "--buckets", "2",
          "--platforms", "cpu"])
    preds, probs, unc = ExportedPredictor(tmp_path / "q")(x)
    assert preds.shape == (2, 32, 32, 1)


def test_registry_serves_exported_artifact(tmp_path, seg_ckpt):
    from ugpg_tpu.eval.serving import ServingRegistry

    ckpt, x = seg_ckpt
    p = Predictor(ckpt, buckets=(2,), dtype=None)
    art = p.export(tmp_path / "reg", platforms=("cpu",))
    reg = ServingRegistry(max_latency_ms=20.0)
    try:
        reg.register_artifact("seg", art)
        with pytest.raises(ValueError, match="already registered"):
            reg.register_artifact("seg", art)
        preds, probs, unc = reg.predict("seg", np.asarray(x))
        np.testing.assert_array_equal(probs, np.asarray(p(np.asarray(x))[1]))
        fut = reg.submit("seg", np.asarray(x[0]))
        assert fut.result(timeout=60)[0].shape == (32, 32, 1)
    finally:
        reg.close()


def test_export_multiplatform_cli(tmp_path, seg_ckpt):
    """The CLI exports a cpu+tpu artifact from this CPU host (cross-platform
    lowering) and ExportedPredictor serves it here."""
    from ugpg_tpu.cli.export_model import main

    ckpt, x = seg_ckpt
    out = tmp_path / "cli_art"
    main(["--model", ckpt, "--out", str(out), "--buckets", "2"])
    q = ExportedPredictor(out)
    assert q.manifest["platforms"] == ["cpu", "tpu"]
    preds, probs, unc = q(x)
    assert preds.shape == (2, 32, 32, 1)
    assert 0.0 <= float(np.min(np.asarray(probs)))
    assert float(np.max(np.asarray(probs))) <= 1.0

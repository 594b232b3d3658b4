"""Whole-slide (native-resolution) serving: eval/slide.py.

The reference's deployment path downsizes arbitrary-size images to the
stage resolution (ref: MoNuSegImprove/test_monuseg.py:164-201); the slide
predictor serves them at NATIVE resolution through the same spatial
halo-exchange path the native evaluator uses.  These tests pin the
serving surface to the eval path exactly: same padding, same programs,
same pixels.  Runs on the fake 8-device CPU mesh (conftest).
"""

import io
import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.eval.serving import ServingRegistry
from ugpg_tpu.eval.slide import ExportedSlidePredictor, SlidePredictor
from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.pgunet import PGUNet1
from ugpg_tpu.parallel.mesh import make_mesh
from ugpg_tpu.uncertainty import binary_uncertainty


@pytest.fixture(scope="module")
def module():
    return PGUNet1(num_classes=1)


@pytest.fixture(scope="module")
def variables(module):
    return module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory, variables):
    tmp = tmp_path_factory.mktemp("slide")
    return save_checkpoint(tmp / "s1", variables, metadata={"stage": 1})


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=8)


def _reference_forward(module, variables, x_f32, divisor):
    """The evaluate_dataset_native unsharded branch: zero-pad to the
    divisor, eval forward, sigmoid/threshold, crop back."""
    h, w = x_f32.shape[1:3]
    ph, pw = (-h) % divisor, (-w) % divisor
    xp = jnp.pad(jnp.asarray(x_f32), ((0, 0), (0, ph), (0, pw), (0, 0)))
    probs = jax.nn.sigmoid(module.apply(variables, xp, False))
    preds = (probs > 0.5).astype(jnp.float32)
    unc = binary_uncertainty(probs)
    return tuple(np.asarray(t[:, :h, :w]) for t in (preds, probs, unc))


def test_slide_predictor_matches_padded_forward(ckpt, module, variables, rng):
    """Unsharded slide serving == the eval path's padded native forward,
    on an odd (non-divisible) request size."""
    p = SlidePredictor(str(ckpt))
    x = rng.random((2, 41, 53, 3)).astype(np.float32)
    got = p(x)
    want = _reference_forward(module, variables, x, divisor=2)
    for g, w in zip(got, want):
        assert g.shape == (2, 41, 53, 1)
        np.testing.assert_allclose(g, w, rtol=0, atol=1e-6)
    np.testing.assert_array_equal(got[0], want[0])


def test_slide_predictor_uint8_requests(ckpt, module, variables, rng):
    """uint8 slides scale by 1/255 — the evaluator's load_raw coercion."""
    p = SlidePredictor(str(ckpt))
    u8 = (rng.random((1, 38, 38, 3)) * 255).astype(np.uint8)
    got = p(u8)
    want = _reference_forward(
        module, variables, u8.astype(np.float32) / 255.0, divisor=2
    )
    np.testing.assert_allclose(got[1], want[1], rtol=0, atol=1e-6)


def test_slide_predictor_mesh_matches_unsharded(ckpt, mesh, rng):
    """Spatially-sharded serving == unsharded serving when the request
    needs no padding (stage-1 mesh divisor: 8 shards * 2 = 16)."""
    pm = SlidePredictor(str(ckpt), mesh=mesh)
    ps = SlidePredictor(str(ckpt))
    x = rng.random((1, 48, 64, 3)).astype(np.float32)
    got_m, got_s = pm(x), ps(x)
    np.testing.assert_array_equal(got_m[0], got_s[0])
    for a, b in zip(got_m[1:], got_s[1:]):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


def test_slide_predictor_mesh_matches_eval_native(ckpt, mesh, rng, tmp_path):
    """The serving surface returns EXACTLY what evaluate_dataset_native
    scores: same mesh, same padding, same memoized spatial program."""
    from ugpg_tpu.eval.monuseg import MoNuSegEvaluator
    from ugpg_tpu.parallel.spatial import spatial_predict

    img = (rng.random((50, 60, 3)) * 255).astype(np.uint8)
    mask = (rng.random((50, 60)) > 0.5).astype(np.uint8)

    class _DS:
        def __len__(self):
            return 1

        def load_raw(self, idx):
            return img, mask

    ev = MoNuSegEvaluator(str(ckpt))
    results = ev.evaluate_dataset_native(_DS(), mesh=mesh)
    assert results["native_resolution"] is True

    p = SlidePredictor(str(ckpt), mesh=mesh)
    preds, _, _ = p(img[None])
    # the evaluator's metric inputs: rebuild its preds via the same call
    x = jnp.asarray(img.astype(np.float32) / 255.0)[None]
    want, _, _ = spatial_predict(ev.variables, x, mesh, stage=1, pad=True)
    np.testing.assert_array_equal(preds[..., 0], np.asarray(want[..., 0]))
    # and the evaluator's dice on that pred matches what serving would score
    from ugpg_tpu.metrics.segmentation import binary_eval_metrics

    m = binary_eval_metrics(
        jnp.asarray(preds[..., 0]), jnp.asarray(mask.astype(np.float32))[None]
    )
    np.testing.assert_allclose(
        float(np.asarray(m["dice"])[0]), results["dice_mean"], atol=1e-8
    )


def test_slide_predictor_chunks_large_batches(ckpt, rng):
    """max_batch chunks device calls without changing outputs."""
    p1 = SlidePredictor(str(ckpt), max_batch=1)
    p3 = SlidePredictor(str(ckpt), max_batch=3)
    x = rng.random((3, 34, 34, 3)).astype(np.float32)
    for a, b in zip(p1(x), p3(x)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    assert p1.stats()["device_calls"] == 3
    assert p3.stats()["device_calls"] == 1


def test_slide_predictor_compact_output(ckpt, rng):
    p = SlidePredictor(str(ckpt), compact_output=True)
    preds, probs, unc = p(rng.random((1, 36, 36, 3)).astype(np.float32))
    assert preds.dtype == np.uint8
    assert probs.dtype == np.float16 and unc.dtype == np.float16


def test_slide_predictor_pad_multiple(ckpt, rng):
    """pad_multiple quantizes padded sizes (bounds recompiles); outputs
    stay request-sized and valid."""
    p = SlidePredictor(str(ckpt), pad_multiple=32)
    for h, w in ((30, 40), (40, 30)):
        preds, probs, unc = p(rng.random((1, h, w, 3)).astype(np.float32))
        assert preds.shape == (1, h, w, 1)
        assert np.isfinite(probs).all()
        assert ((unc >= 0) & (unc <= 1)).all()


def test_slide_predictor_rejects_bad_requests(ckpt):
    p = SlidePredictor(str(ckpt))
    with pytest.raises(ValueError, match="B, H, W, 3"):
        p(np.zeros((4, 4, 3), np.float32))  # missing batch dim (direct API)
    with pytest.raises(ValueError, match="num_classes"):
        SlidePredictor(str(ckpt), num_classes=2)


# ---------------------------------------------------------------------------
# registry + HTTP


def test_registry_slide_predict_and_submit(ckpt, rng):
    reg = ServingRegistry()
    reg.register_slide("slide", str(ckpt))
    x = rng.random((1, 42, 42, 3)).astype(np.float32)
    direct = SlidePredictor(str(ckpt))(x)
    got = reg.predict("slide", x)
    for a, b in zip(got, direct):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # submit() bypasses the micro-batcher (sizes can't coalesce) but stays
    # future-shaped
    fut = reg.submit("slide", x[0])
    out = fut.result(timeout=60)
    for a, b in zip(out, direct):
        np.testing.assert_allclose(a, b[0], rtol=0, atol=1e-6)
    reg.close()


def test_http_slide_native_res_roundtrip(ckpt, rng):
    """A synthetic slide served over HTTP returns the NATIVE-res mask —
    the behavior the reference's lossy resize path cannot produce
    (ref: test_monuseg.py:164-201)."""
    import urllib.request

    from ugpg_tpu.eval.http_server import ServingHTTPServer

    reg = ServingRegistry()
    reg.register_slide("slide", str(ckpt))
    server = ServingHTTPServer(reg, host="127.0.0.1", port=0)
    port = server.start()
    try:
        img = rng.random((46, 58, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models/slide:predict",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            out = np.load(io.BytesIO(resp.read()))
        direct = SlidePredictor(str(ckpt))(img[None])
        for name, want in zip(("preds", "probs", "uncertainty"), direct):
            assert out[name].shape == (46, 58, 1)  # native res, not 32x32
            np.testing.assert_allclose(out[name], want[0], rtol=0, atol=1e-6)
        # model metadata advertises the native-resolution contract
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/models/slide", timeout=30
        ) as resp:
            info = json.loads(resp.read())
        assert info["resolution"] == "native"
    finally:
        server.close()
        reg.close()


# ---------------------------------------------------------------------------
# export / import


def test_slide_export_roundtrip(ckpt, rng, tmp_path):
    p = SlidePredictor(str(ckpt))
    art = p.export(tmp_path / "art", sizes=((40, 40), (48, 64)),
                   platforms=("cpu",))
    pe = ExportedSlidePredictor(art)
    # exact-size request: identical padding on both paths -> exact match
    x = rng.random((1, 40, 40, 3)).astype(np.float32)
    for a, b in zip(p(x), pe(x)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)
    # smaller request routes to the tightest bucket and crops back
    preds, probs, unc = pe(rng.random((1, 44, 50, 3)).astype(np.float32))
    assert preds.shape == (1, 44, 50, 1)
    assert np.isfinite(probs).all()
    with pytest.raises(ValueError, match="exceeds every exported size"):
        pe(rng.random((1, 80, 80, 3)).astype(np.float32))


def test_registry_artifact_dispatches_slide_manifest(ckpt, rng, tmp_path):
    art = SlidePredictor(str(ckpt)).export(
        tmp_path / "art2", sizes=((40, 40),), platforms=("cpu",)
    )
    reg = ServingRegistry()
    pe = reg.register_artifact("slide_art", art)
    assert isinstance(pe, ExportedSlidePredictor)
    preds, _, _ = reg.predict(
        "slide_art", rng.random((1, 40, 40, 3)).astype(np.float32)
    )
    assert preds.shape == (1, 40, 40, 1)
    reg.close()


def test_exported_slide_rejects_bucket_artifact(ckpt, tmp_path):
    from ugpg_tpu.eval.serving import Predictor

    art = Predictor(str(ckpt), dtype=None, buckets=(1,)).export(
        tmp_path / "bucket_art", platforms=("cpu",)
    )
    with pytest.raises(ValueError, match="not a slide artifact"):
        ExportedSlidePredictor(art)


# ---------------------------------------------------------------------------
# the full-size flagship case (slow: stage-4 at 1000x1000 on 1-core CPU)


@pytest.mark.slow
def test_http_slide_1000px_stage4_mesh(rng, tmp_path):
    """A 1000x1000 MoNuSeg-sized slide served over HTTP on the fake
    8-device mesh returns the native-res mask, exact-matching the
    spatially-sharded eval path."""
    import urllib.request

    from ugpg_tpu.eval.http_server import ServingHTTPServer
    from ugpg_tpu.models.pgunet import PGUNet4
    from ugpg_tpu.parallel.spatial import spatial_predict

    m4 = PGUNet4(num_classes=1)
    v4 = m4.init(jax.random.key(1), jnp.zeros((1, 64, 64, 3)), False)
    ckpt4 = save_checkpoint(tmp_path / "s4", v4, metadata={"stage": 4})
    mesh = make_mesh(n_data=8)
    reg = ServingRegistry()
    reg.register_slide("slide4", str(ckpt4), mesh=mesh)
    server = ServingHTTPServer(reg, host="127.0.0.1", port=0)
    port = server.start()
    try:
        img = (rng.random((1000, 1000, 3)) * 255).astype(np.uint8)
        buf = io.BytesIO()
        np.save(buf, img)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/models/slide4:predict",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=1800) as resp:
            out = np.load(io.BytesIO(resp.read()))
        assert out["preds"].shape == (1000, 1000, 1)
        x = jnp.asarray(img.astype(np.float32) / 255.0)[None]
        variables = reg.get("slide4").variables
        want, _, _ = spatial_predict(variables, x, mesh, stage=4, pad=True)
        np.testing.assert_array_equal(
            out["preds"][..., 0], np.asarray(want[0, ..., 0])
        )
    finally:
        server.close()
        reg.close()

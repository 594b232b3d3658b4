"""HTTP serving front end: routes, encodings, micro-batching, errors."""

import io
import json
import threading
from http.client import HTTPConnection

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.eval.http_server import ServingHTTPServer
from ugpg_tpu.eval.serving import ServingRegistry
from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import PGUNet1


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("http_serve")
    seg = PGUNet1(num_classes=1)
    v = seg.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    seg_ckpt = save_checkpoint(tmp / "seg1", v, metadata={"stage": 1})
    cls = HerlevClassificationModel(stage=1, num_classes=5)
    vc = cls.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), False)
    cls_ckpt = save_checkpoint(tmp / "cls1", vc, metadata={"stage": 1})

    registry = ServingRegistry(max_latency_ms=20.0)
    registry.register("seg", str(seg_ckpt), buckets=(1, 4), dtype=None)
    registry.register("cls", str(cls_ckpt), task_type="classification",
                      num_classes=5, buckets=(1, 4), dtype=None)
    server = ServingHTTPServer(registry, port=0)
    port = server.start()
    yield registry, port
    server.close()
    registry.close()


def _request(port, method, path, body=None, ctype=None):
    conn = HTTPConnection("127.0.0.1", port, timeout=60)
    headers = {"Content-Type": ctype} if ctype else {}
    conn.request(method, path, body=body, headers=headers)
    resp = conn.getresponse()
    data = resp.read()
    conn.close()
    return resp.status, resp.getheader("Content-Type"), data


def _npy_bytes(arr):
    buf = io.BytesIO()
    np.save(buf, arr)
    return buf.getvalue()


def test_health_and_model_metadata(served):
    _, port = served
    status, ctype, data = _request(port, "GET", "/v1/health")
    assert status == 200 and ctype == "application/json"
    body = json.loads(data)
    assert body["status"] == "ok" and body["models"] == ["cls", "seg"]

    status, _, data = _request(port, "GET", "/v1/models")
    models = {m["name"]: m for m in json.loads(data)["models"]}
    assert models["seg"]["task_type"] == "segmentation"
    assert models["seg"]["outputs"] == ["preds", "probs", "uncertainty"]
    assert models["seg"]["resolution"] == 32
    assert models["cls"]["outputs"] == ["labels", "probs"]

    status, _, data = _request(port, "GET", "/v1/models/seg")
    assert status == 200 and json.loads(data)["buckets"] == [1, 4]
    status, _, _ = _request(port, "GET", "/v1/models/nope")
    assert status == 404


def test_npy_batch_matches_direct_predict(served, rng):
    registry, port = served
    x = rng.random((3, 32, 32, 3)).astype(np.float32)
    status, ctype, data = _request(
        port, "POST", "/v1/models/seg:predict",
        body=_npy_bytes(x), ctype="application/x-npy",
    )
    assert status == 200 and ctype == "application/x-npz"
    out = np.load(io.BytesIO(data))
    assert set(out.files) == {"preds", "probs", "uncertainty"}
    want = registry.predict("seg", x)
    np.testing.assert_allclose(out["probs"], want[1], atol=1e-6)
    np.testing.assert_array_equal(out["preds"], want[0])


def test_single_image_micro_batched_concurrent(served, rng):
    """Concurrent single-image HTTP requests coalesce through the
    micro-batcher and each gets ITS OWN image's result back."""
    registry, port = served
    images = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(4)]
    results = [None] * 4

    def call(i):
        status, _, data = _request(
            port, "POST", "/v1/models/seg:predict",
            body=_npy_bytes(images[i]), ctype="application/x-npy",
        )
        assert status == 200
        results[i] = np.load(io.BytesIO(data))

    threads = [threading.Thread(target=call, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i in range(4):
        want = registry.predict("seg", images[i][None])
        assert results[i]["probs"].shape == (32, 32, 1)  # per-image, no batch dim
        np.testing.assert_allclose(results[i]["probs"], want[1][0], atol=1e-5)


def test_json_classification_roundtrip(served, rng):
    registry, port = served
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    status, _, data = _request(
        port, "POST", "/v1/models/cls:predict",
        body=json.dumps({"instances": x.tolist()}).encode(),
        ctype="application/json",
    )
    assert status == 200
    preds = json.loads(data)["predictions"]
    want_labels, want_probs = registry.predict("cls", x)
    assert preds["labels"] == want_labels.tolist()
    np.testing.assert_allclose(
        np.asarray(preds["probs"]), want_probs, atol=1e-6
    )


def test_stats_counters(served, rng):
    """/v1/stats reflects traffic: request/image counts, latency window,
    and coalescing ratios once the micro-batcher has served singles."""
    registry, port = served
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    _request(port, "POST", "/v1/models/seg:predict",
             body=_npy_bytes(x), ctype="application/x-npy")
    status, _, data = _request(port, "GET", "/v1/stats")
    assert status == 200
    stats = json.loads(data)
    seg = stats["seg"]["predictor"]
    assert seg["requests"] >= 1 and seg["images"] >= 2
    assert seg["device_calls"] >= 1
    assert seg["latency_ms"]["p50"] > 0
    # batcher stats appear after single-image (submit) traffic, which
    # earlier tests in this module generated
    if "batcher" in stats["seg"]:
        b = stats["seg"]["batcher"]
        assert b["submitted"] >= b["groups"] >= 1
        assert b["mean_group"] >= 1.0


def test_error_paths(served, rng):
    _, port = served
    ok = rng.random((1, 32, 32, 3)).astype(np.float32)
    # unknown model -> 404
    status, _, data = _request(port, "POST", "/v1/models/ghost:predict",
                               body=_npy_bytes(ok), ctype="application/x-npy")
    assert status == 404 and "unknown model" in json.loads(data)["error"]
    # bad shape -> 400
    status, _, _ = _request(port, "POST", "/v1/models/seg:predict",
                            body=_npy_bytes(np.zeros((2, 5))),
                            ctype="application/x-npy")
    assert status == 400
    # wrong content type -> 415
    status, _, _ = _request(port, "POST", "/v1/models/seg:predict",
                            body=b"bytes", ctype="text/plain")
    assert status == 415
    # malformed JSON -> 400
    status, _, _ = _request(port, "POST", "/v1/models/seg:predict",
                            body=b"{nope", ctype="application/json")
    assert status == 400
    # JSON without "instances" -> 400
    status, _, _ = _request(port, "POST", "/v1/models/seg:predict",
                            body=b'{"x": 1}', ctype="application/json")
    assert status == 400
    # empty body -> 400
    status, _, _ = _request(port, "POST", "/v1/models/seg:predict",
                            body=b"", ctype="application/x-npy")
    assert status == 400
    # bad route -> 404
    status, _, _ = _request(port, "POST", "/v1/other", body=b"x",
                            ctype="application/x-npy")
    assert status == 404


def test_error_response_closes_keepalive_connection(served):
    """Error paths may leave the request body unread; the server must
    close the keep-alive connection or the leftover bytes desync HTTP/1.1
    framing for the next request on the socket."""
    _, port = served
    conn = HTTPConnection("127.0.0.1", port, timeout=60)
    body = b"x" * 4096  # never parsed: unknown model 404s before the read
    conn.request("POST", "/v1/models/ghost:predict", body=body,
                 headers={"Content-Type": "application/x-npy"})
    resp = conn.getresponse()
    assert resp.status == 404
    assert (resp.getheader("Connection") or "").lower() == "close"
    resp.read()
    conn.close()


def test_serve_cli_wires_registry(tmp_path, monkeypatch, rng):
    """The CLI parses specs, registers models, and starts the server; we
    stub serve_forever so it returns immediately."""
    seg = PGUNet1(num_classes=1)
    v = seg.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = save_checkpoint(tmp_path / "seg1", v, metadata={"stage": 1})

    from ugpg_tpu.cli import serve as serve_cli
    from ugpg_tpu.eval import http_server as hs

    captured = {}

    def fake_serve_forever(self):
        captured["names"] = self.registry.names()
        captured["port"] = self.port

    monkeypatch.setattr(hs.ServingHTTPServer, "serve_forever",
                        fake_serve_forever)
    serve_cli.main(["--model", f"m={ckpt}", "--buckets", "1", "2",
                    "--host", "127.0.0.1", "--port", "0"])
    assert captured["names"] == ["m"]
    assert captured["port"] > 0

    with pytest.raises(SystemExit):
        serve_cli.main(["--port", "0"])  # nothing to serve
    with pytest.raises(SystemExit):
        serve_cli.main(["--model", "missing-equals", "--port", "0"])

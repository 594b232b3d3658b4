"""Capstone user journey: train -> evaluate -> export -> serve over HTTP.

One slow-marked test walks the full lifecycle a reference user would
migrate to, entirely through public surfaces (CLIs + HTTP), on a
synthetic MoNuSeg tree: the pieces are all covered individually
elsewhere; this pins that they compose.
"""

import io
import json
from http.client import HTTPConnection

import numpy as np
import pytest

from tests.test_data_herlev import write_herlev_tree
from tests.test_data_monuseg import write_monuseg_tree


@pytest.mark.slow  # ~4 min: real train/eval/export CLIs end to end
def test_full_lifecycle_train_eval_export_serve(tmp_path, rng):
    data = write_monuseg_tree(tmp_path / "MoNuSeg")
    out = tmp_path / "out"

    # 1. train (stage 1, 1 epoch, accumulation on) through the CLI
    from ugpg_tpu.cli.train_monuseg import main as train_main

    train_main(["--data_dir", str(data), "--output_dir", str(out),
                "--plain", "--stages", "1", "--epochs", "1",
                "--batch_size", "4", "--accum_steps", "2",
                "--checkpoint_every", "1"])
    ckpt = out / "ug_pgunet_stage1_best"
    assert ckpt.exists() and (out / "training_log.csv").exists()

    # 2. evaluate the checkpoint through the eval CLI
    from ugpg_tpu.cli.test_monuseg import main as eval_main

    eval_main(["--model", str(ckpt), "--data", str(data), "--eval_full",
               "--num_images", "1", "--output_dir", str(tmp_path / "ev")])
    metrics = json.loads(
        (tmp_path / "ev" / "evaluation_results.json").read_text()
    )
    assert 0.0 <= metrics["dice_mean"] <= 1.0
    assert metrics["stage"] == 1

    # 3. export a deployment artifact through the export CLI
    from ugpg_tpu.cli.export_model import main as export_main

    export_main(["--model", str(ckpt), "--out", str(tmp_path / "art"),
                 "--buckets", "1", "2", "--platforms", "cpu"])

    # 4. serve checkpoint AND artifact side by side over HTTP
    from ugpg_tpu.eval.http_server import ServingHTTPServer
    from ugpg_tpu.eval.serving import ServingRegistry

    registry = ServingRegistry(max_latency_ms=20.0)
    registry.register("live", str(ckpt), buckets=(1, 2), dtype=None)
    registry.register_artifact("frozen", tmp_path / "art")
    server = ServingHTTPServer(registry, port=0)
    port = server.start()
    try:
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        results = {}
        for name in ("live", "frozen"):
            conn = HTTPConnection("127.0.0.1", port, timeout=120)
            conn.request("POST", f"/v1/models/{name}:predict",
                         body=buf.getvalue(),
                         headers={"Content-Type": "application/x-npy"})
            resp = conn.getresponse()
            assert resp.status == 200
            results[name] = np.load(io.BytesIO(resp.read()))
            conn.close()
        # the exported artifact serves the SAME model: probabilities agree
        np.testing.assert_allclose(results["live"]["probs"],
                                   results["frozen"]["probs"], atol=1e-5)
        assert results["live"]["preds"].shape == (2, 32, 32, 1)
    finally:
        server.close()
        registry.close()


@pytest.mark.slow  # ~12 min: classification lifecycle through public surfaces
def test_cls_lifecycle_train_eval_serve(tmp_path, rng):
    data = write_herlev_tree(tmp_path / "Herlev")
    out = tmp_path / "out"

    # 1. train stage 1 through the CLI (7-class, 1 epoch)
    from ugpg_tpu.cli.train_herlev import main as train_main

    train_main(["--data_dir", str(data), "--output_dir", str(out),
                "--stages", "1", "--epochs", "1", "--batch_size", "8",
                "--accum_steps", "2"])
    ckpt = out / "herlev_stage1_best"
    assert ckpt.exists()

    # 2. evaluate through the eval CLI (report/confusion/ROC-AUC suite)
    from ugpg_tpu.cli.test_herlev import main as eval_main

    results = eval_main(["--model", str(ckpt), "--data_dir", str(data),
                         "--split", "val", "--num_samples", "4",
                         "--output_dir", str(tmp_path / "ev")])
    assert 0.0 <= results["accuracy"] <= 1.0
    assert "weighted avg" in results["classification_report"]

    # 3. serve it over HTTP (classification flavor: labels + probs)
    from ugpg_tpu.eval.http_server import ServingHTTPServer
    from ugpg_tpu.eval.serving import ServingRegistry

    registry = ServingRegistry(max_latency_ms=20.0)
    registry.register("cls", str(ckpt), task_type="classification",
                      num_classes=7, buckets=(2,), dtype=None)
    server = ServingHTTPServer(registry, port=0)
    port = server.start()
    try:
        x = rng.random((2, 32, 32, 3)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, x)
        conn = HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("POST", "/v1/models/cls:predict", body=buf.getvalue(),
                     headers={"Content-Type": "application/x-npy"})
        resp = conn.getresponse()
        assert resp.status == 200
        got = np.load(io.BytesIO(resp.read()))
        conn.close()
        assert got["labels"].shape == (2,) and got["probs"].shape == (2, 7)
        np.testing.assert_allclose(got["probs"].sum(-1), 1.0, atol=1e-5)
    finally:
        server.close()
        registry.close()

"""Serving predictor: AOT compile, padding, streaming."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.eval.serving import Predictor
from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.pgunet import PGUNet1


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve")
    module = PGUNet1(num_classes=1)
    v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    return save_checkpoint(tmp / "s1", v, metadata={"stage": 1})


def test_predictor_exact_batch(ckpt, rng):
    p = Predictor(str(ckpt), batch_size=4, dtype=None)
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    preds, probs, unc = p(x)
    assert preds.shape == (4, 32, 32, 1)
    assert set(np.unique(preds)).issubset({0.0, 1.0})
    assert 0.0 <= unc.min() and unc.max() <= 1.0


def test_predictor_ragged_and_multi_chunk(ckpt, rng):
    p = Predictor(str(ckpt), batch_size=4, dtype=None)
    x = rng.random((10, 32, 32, 3)).astype(np.float32)  # 3 chunks, last ragged
    preds, probs, unc = p(x)
    assert preds.shape == (10, 32, 32, 1)
    # padding must not contaminate results: compare against one-by-one
    single = Predictor(str(ckpt), batch_size=4, dtype=None)
    p2 = single(x[7:10])
    np.testing.assert_allclose(probs[7:10], p2[1], atol=1e-6)


def test_predictor_resizes_input(ckpt, rng):
    p = Predictor(str(ckpt), batch_size=2, dtype=None)
    x = rng.random((2, 100, 80, 3)).astype(np.float32)
    preds, _, _ = p(x)
    assert preds.shape == (2, 32, 32, 1)  # model resolution output


def test_predictor_stream(ckpt, rng):
    p = Predictor(str(ckpt), batch_size=4, dtype=None)
    batches = [rng.random((4, 32, 32, 3)).astype(np.float32) for _ in range(2)]
    batches.append(rng.random((2, 32, 32, 3)).astype(np.float32))
    outs = list(p.stream(iter(batches)))
    assert len(outs) == 3
    assert outs[0][0].shape == (4, 32, 32, 1)
    assert outs[2][0].shape == (2, 32, 32, 1)


def test_predictor_fold_matches_unfolded(ckpt, rng):
    x = rng.random((3, 32, 32, 3)).astype(np.float32)
    p_folded = Predictor(str(ckpt), batch_size=4, dtype=None, fold_bn=True)
    p_plain = Predictor(str(ckpt), batch_size=4, dtype=None, fold_bn=False)
    np.testing.assert_allclose(
        p_folded(x)[1], p_plain(x)[1], rtol=1e-4, atol=1e-4
    )


@pytest.fixture(scope="module")
def cls_ckpt(tmp_path_factory):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    tmp = tmp_path_factory.mktemp("serve_cls")
    module = HerlevClassificationModel(stage=1, num_classes=5)
    v = module.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), False)
    return save_checkpoint(tmp / "c1", v, metadata={"stage": 1})


def test_predictor_buckets_route_and_match(ckpt, rng):
    p = Predictor(str(ckpt), dtype=None, buckets=(1, 2, 8))
    assert p.buckets == (1, 2, 8)
    assert p.batch_size == 8
    x = rng.random((5, 32, 32, 3)).astype(np.float32)
    probs_all = p(x)[1]
    # single image routes through the 1-bucket and must match
    probs_one = p(x[:1])[1]
    np.testing.assert_allclose(probs_one, probs_all[:1], atol=1e-6)
    assert p._bucket_for(1) == 1 and p._bucket_for(2) == 2
    assert p._bucket_for(3) == 8 and p._bucket_for(99) == 8


def test_classification_predictor(cls_ckpt, rng):
    p = Predictor(str(cls_ckpt), task_type="classification",
                  num_classes=5, dtype=None, buckets=(4,))
    x = rng.random((6, 32, 32, 3)).astype(np.float32)
    labels, probs = p(x)
    assert labels.shape == (6,) and probs.shape == (6, 5)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert np.array_equal(labels, probs.argmax(-1))


def test_mc_dropout_predictor(cls_ckpt, rng):
    """mc_dropout=N: third output = per-sample predictive variance; labels
    come from the MC-mean probs; identical requests -> identical responses
    (keys derive from mc_seed only)."""
    p = Predictor(str(cls_ckpt), task_type="classification",
                  num_classes=5, dtype=None, buckets=(4,), mc_dropout=6)
    assert p._n_outputs == 3
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    labels, probs, var = p(x)
    assert labels.shape == (4,) and probs.shape == (4, 5) and var.shape == (4,)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert np.array_equal(labels, probs.argmax(-1))
    assert float(var.max()) > 0.0  # dropout (.5/.3/.2 head) is active
    # reproducible serving: same request, same response
    labels2, probs2, var2 = p(x)
    np.testing.assert_array_equal(probs, probs2)
    np.testing.assert_array_equal(var, var2)
    # MC mean differs from the deterministic single pass (dropout really on)
    det = Predictor(str(cls_ckpt), task_type="classification",
                    num_classes=5, dtype=None, buckets=(4,))
    assert not np.allclose(det(x)[1], probs)


def test_mc_dropout_validation(ckpt, cls_ckpt):
    with pytest.raises(ValueError, match="classification"):
        Predictor(str(ckpt), dtype=None, mc_dropout=4)
    with pytest.raises(ValueError, match=">= 2"):
        Predictor(str(cls_ckpt), task_type="classification", num_classes=5,
                  dtype=None, mc_dropout=1)


def test_predictor_rejects_bad_task_type(ckpt):
    with pytest.raises(ValueError, match="task_type"):
        Predictor(str(ckpt), task_type="detection")


def test_batching_server_coalesces_and_matches(ckpt, rng):
    from ugpg_tpu.eval.serving import BatchingServer

    p = Predictor(str(ckpt), dtype=None, buckets=(4,))
    server = BatchingServer(p, max_latency_ms=50.0)
    imgs = rng.random((6, 32, 32, 3)).astype(np.float32)
    futures = [server.submit(im) for im in imgs]
    results = [f.result(timeout=30) for f in futures]
    server.close()
    want = p(imgs)
    for i, res in enumerate(results):
        assert len(res) == 3
        np.testing.assert_allclose(res[1], want[1][i], atol=1e-5)


def test_batching_server_single_request_deadline(ckpt, rng):
    """One lone request must be served within ~the deadline, not wait for a
    full bucket."""
    import time as _time

    from ugpg_tpu.eval.serving import BatchingServer

    p = Predictor(str(ckpt), dtype=None, buckets=(8,))
    p(rng.random((1, 32, 32, 3)).astype(np.float32))  # warm resize jit
    server = BatchingServer(p, max_latency_ms=20.0)
    t0 = _time.monotonic()
    fut = server.submit(rng.random((32, 32, 3)).astype(np.float32))
    out = fut.result(timeout=30)
    elapsed = _time.monotonic() - t0
    server.close()
    assert out[0].shape == (32, 32, 1)
    assert elapsed < 10.0  # generous CI bound; deadline is 20 ms


def test_batching_server_close_drains(ckpt, rng):
    from ugpg_tpu.eval.serving import BatchingServer

    p = Predictor(str(ckpt), dtype=None, buckets=(4,))
    server = BatchingServer(p, max_latency_ms=1000.0)
    futs = [server.submit(rng.random((32, 32, 3)).astype(np.float32))
            for _ in range(3)]
    server.close()  # must flush the pending partial batch
    for f in futs:
        assert f.result(timeout=5)[1].shape == (32, 32, 1)
    with pytest.raises(RuntimeError):
        server.submit(rng.random((32, 32, 3)).astype(np.float32))


def test_predictor_uint8_input_path(ckpt, rng):
    """uint8-compiled predictor: raw uint8 requests match the float path
    (device-side /255); float inputs are coerced."""
    x8 = (rng.random((3, 32, 32, 3)) * 255).astype(np.uint8)
    p8 = Predictor(str(ckpt), dtype=None, buckets=(4,), input_dtype=jnp.uint8)
    pf = Predictor(str(ckpt), dtype=None, buckets=(4,))
    got = p8(x8)[1]
    want = pf(x8.astype(np.float32) / 255.0)[1]
    np.testing.assert_allclose(got, want, atol=1e-5)
    # float input into the uint8 predictor round-trips through uint8
    got2 = p8(x8.astype(np.float32) / 255.0)[1]
    np.testing.assert_allclose(got2, want, atol=1e-2)  # uint8 quantization
    with pytest.raises(ValueError, match="input_dtype"):
        Predictor(str(ckpt), dtype=None, input_dtype=jnp.int16)


def test_batching_server_mixed_shapes_and_dtypes(ckpt, rng):
    """Mixed request sizes/dtypes must coalesce (coerced per image), not
    kill the worker and strand futures."""
    from ugpg_tpu.eval.serving import BatchingServer

    p = Predictor(str(ckpt), dtype=None, buckets=(4,))
    server = BatchingServer(p, max_latency_ms=100.0)
    futs = [
        server.submit(rng.random((32, 32, 3)).astype(np.float32)),
        server.submit((rng.random((48, 40, 3)) * 255).astype(np.uint8)),
        server.submit(rng.random((20, 20, 3)).astype(np.float32)),
    ]
    for f in futs:
        out = f.result(timeout=60)
        assert out[0].shape == (32, 32, 1)
    server.close()


def test_batching_server_bad_request_resolves_future(ckpt, rng):
    from ugpg_tpu.eval.serving import BatchingServer

    p = Predictor(str(ckpt), dtype=None, buckets=(4,))
    server = BatchingServer(p, max_latency_ms=50.0)
    with pytest.raises(ValueError, match="expected one"):
        server.submit(rng.random((4, 32, 32, 3)))  # batch, not one image
    # a good request afterwards still works
    out = server.submit(rng.random((32, 32, 3)).astype(np.float32)).result(30)
    assert out[0].shape == (32, 32, 1)
    server.close()


def test_serving_registry_multi_model(ckpt, cls_ckpt, rng):
    from ugpg_tpu.eval.serving import ServingRegistry

    reg = ServingRegistry(max_latency_ms=30.0)
    reg.register("seg", str(ckpt), dtype=None, buckets=(4,))
    reg.register("cls", str(cls_ckpt), task_type="classification",
                 num_classes=5, dtype=None, buckets=(4,))
    assert reg.names() == ["cls", "seg"]
    with pytest.raises(ValueError, match="already registered"):
        reg.register("seg", str(ckpt))
    with pytest.raises(KeyError, match="unknown model"):
        reg.get("nope")

    x = rng.random((3, 32, 32, 3)).astype(np.float32)
    preds, probs, unc = reg.predict("seg", x)
    assert preds.shape == (3, 32, 32, 1)
    labels, cprobs = reg.predict("cls", x)
    assert labels.shape == (3,) and cprobs.shape == (3, 5)

    # micro-batched single requests against both models concurrently
    futs = [reg.submit("seg", x[0]), reg.submit("cls", x[1]),
            reg.submit("seg", x[2])]
    assert futs[0].result(30)[0].shape == (32, 32, 1)
    assert futs[1].result(30)[1].shape == (5,)
    assert futs[2].result(30)[0].shape == (32, 32, 1)
    reg.close()
    # predictors remain usable after close; a new submit re-creates a server
    reg.predict("seg", x)
    assert reg.submit("seg", x[0]).result(30)[0].shape == (32, 32, 1)
    reg.close()


def test_serving_registry_unregister_and_replace(ckpt, rng):
    """Model lifecycle: unregister frees the name (draining its batcher);
    replace swaps the predictor with zero unavailable window."""
    from ugpg_tpu.eval.serving import ServingRegistry

    reg = ServingRegistry(max_latency_ms=30.0)
    reg.register("m", str(ckpt), dtype=None, buckets=(4,))
    x = rng.random((2, 32, 32, 3)).astype(np.float32)
    # exercise submit so a micro-batcher exists before removal
    assert reg.submit("m", x[0]).result(30)[0].shape == (32, 32, 1)

    reg.unregister("m")
    assert reg.names() == []
    with pytest.raises(KeyError, match="unknown model"):
        reg.predict("m", x)
    with pytest.raises(KeyError, match="unknown model"):
        reg.unregister("m")
    # the name is free again
    reg.register("m", str(ckpt), dtype=None, buckets=(4,))
    old = reg.get("m")

    new = reg.replace("m", str(ckpt), dtype=None, buckets=(2,))
    assert reg.get("m") is new and new is not old
    assert reg.get("m").buckets == (2,)
    preds, _, _ = reg.predict("m", x)
    assert preds.shape == (2, 32, 32, 1)
    with pytest.raises(KeyError, match="unknown model"):
        reg.replace("ghost", str(ckpt))
    reg.close()


def test_predictor_compact_output(ckpt, rng):
    """compact_output: uint8 preds + f16 maps (2.4x fewer response bytes),
    numerically tracking the f32 responses."""
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    pf = Predictor(str(ckpt), batch_size=4, dtype=None)
    pc = Predictor(str(ckpt), batch_size=4, dtype=None, compact_output=True)
    preds_f, probs_f, unc_f = pf(x)
    preds_c, probs_c, unc_c = pc(x)
    assert preds_c.dtype == np.uint8
    assert probs_c.dtype == np.float16 and unc_c.dtype == np.float16
    np.testing.assert_array_equal(preds_c.astype(np.float32), preds_f)
    np.testing.assert_allclose(probs_c.astype(np.float32), probs_f, atol=1e-3)
    np.testing.assert_allclose(unc_c.astype(np.float32), unc_f, atol=2e-3)


def test_predictor_compact_output_rejects_classification(cls_ckpt):
    with pytest.raises(ValueError):
        Predictor(str(cls_ckpt), task_type="classification", num_classes=5,
                  dtype=None, compact_output=True)


def test_mc_dropout_bf16_model_emits_f32_statistics(cls_ckpt, rng):
    """With the default bf16 compute dtype the MC mean/variance must still
    be f32 over f32 probabilities — bf16 probs quantize at ~4e-3 near
    p=0.5, the same order as small real epistemic variances."""
    p = Predictor(str(cls_ckpt), task_type="classification", num_classes=5,
                  buckets=(4,), mc_dropout=4)  # default dtype = bf16
    x = rng.random((4, 32, 32, 3)).astype(np.float32)
    labels, probs, var = p(x)
    assert probs.dtype == np.float32 and var.dtype == np.float32
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert 0.0 <= float(var.min()) and float(var.max()) <= 0.25

"""Data-parallel serving: Predictor(mesh=...) GSPMD buckets.

Each bucket compiles as one GSPMD program with the request batch sharded
over the mesh 'data' axis and the weights replicated — the multi-chip
serving analog of the trainers' mesh= path (the reference serves strictly
single-device, ref: test_monuseg.py:105-162).  Runs on the fake 8-device
CPU mesh (conftest).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ugpg_tpu.eval.serving import BatchingServer, Predictor
from ugpg_tpu.io.checkpoint import save_checkpoint
from ugpg_tpu.models.pgunet import PGUNet1
from ugpg_tpu.parallel.mesh import make_mesh


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_mesh")
    module = PGUNet1(num_classes=1)
    v = module.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), False)
    return save_checkpoint(tmp / "s1", v, metadata={"stage": 1})


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(n_data=8)


def test_mesh_predictor_matches_single_device(ckpt, mesh, rng):
    pm = Predictor(str(ckpt), dtype=None, buckets=(8, 16), mesh=mesh)
    ps = Predictor(str(ckpt), dtype=None, buckets=(8, 16))
    x = rng.random((16, 32, 32, 3)).astype(np.float32)
    out_m = pm(x)
    out_s = ps(x)
    for a, b in zip(out_m, out_s):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_mesh_predictor_shards_batch_over_data(ckpt, mesh):
    p = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh)
    in_sh, _ = p._compiled[8].input_shardings
    # arg 1 is the image batch: sharded over 'data' on the leading axis
    batch_sharding = in_sh[1]
    assert batch_sharding.is_equivalent_to(p._batch_sharding, 4)
    # the weights are replicated (every leaf's sharding spec is empty)
    assert jax.tree_util.tree_all(
        jax.tree.map(
            lambda s: s.is_equivalent_to(p._var_sharding, 1), in_sh[0]
        )
    )


def test_mesh_predictor_ragged_and_padding(ckpt, mesh, rng):
    """Ragged requests route/pad exactly as on one chip."""
    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh)
    ps = Predictor(str(ckpt), dtype=None, buckets=(8,))
    for n in (1, 5, 11):
        x = rng.random((n, 32, 32, 3)).astype(np.float32)
        for a, b in zip(pm(x), ps(x)):
            assert a.shape[0] == n
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_mesh_predictor_rejects_indivisible_buckets(ckpt, mesh):
    with pytest.raises(ValueError, match="do not divide"):
        Predictor(str(ckpt), dtype=None, buckets=(8, 12), mesh=mesh)


def test_mesh_predictor_rejects_mesh_without_data_axis(ckpt):
    from jax.sharding import Mesh

    m = Mesh(np.asarray(jax.devices()[:8]).reshape(8), axis_names=("model",))
    with pytest.raises(ValueError, match="'data' axis"):
        Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=m)


def test_mesh_predictor_under_batching_server(ckpt, mesh, rng):
    """Concurrent single-image submits coalesce into sharded device calls."""
    p = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh)
    server = BatchingServer(p, max_latency_ms=30.0)
    images = [rng.random((32, 32, 3)).astype(np.float32) for _ in range(8)]
    futs = [server.submit(im) for im in images]
    outs = [f.result(timeout=60) for f in futs]
    server.close()
    ps = Predictor(str(ckpt), dtype=None, buckets=(8,))
    ref = ps(np.stack(images))
    for i, out in enumerate(outs):
        for a, b in zip(out, ref):
            np.testing.assert_allclose(a, b[i], rtol=0, atol=1e-6)


def test_tp_mesh_predictor_matches_single_device(ckpt, rng):
    """shard_model=True: wide conv kernels over 'model' (training TP
    layout), batch over 'data' — still exact vs one chip."""
    m = make_mesh(n_data=2, n_model=4)
    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=m,
                   shard_model=True)
    # at least one kernel actually sharded over 'model'
    leaves = jax.tree_util.tree_leaves(pm.variables)
    assert any(
        v.ndim == 4 and "model" in tuple(v.sharding.spec) for v in leaves
    )
    ps = Predictor(str(ckpt), dtype=None, buckets=(8,))
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    for a, b in zip(pm(x), ps(x)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-5)


@pytest.mark.slow
def test_tp_mesh_quantized(ckpt, rng):
    """int8 W8A8 under TP: the wq kernels shard over 'model' on the same
    output-channel axis their per-channel scales index (the epilogue stays
    pointwise on the sharded channels), batch over 'data' — matches the
    single-device int8 path to f32 head-reduction round-off.

    slow: compile is 5s, but EXECUTING the channel-sharded int8 program on
    the fake multi-device 1-core CPU backend takes ~200s (the all-to-all
    between sharded convs serializes through rendezvous stalls — a test-
    host artifact, not a layout property; on TPU the collectives ride
    ICI)."""
    m = make_mesh(n_data=2, n_model=2)
    calib = [rng.random((4, 32, 32, 3)).astype(np.float32)]
    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=m,
                   shard_model=True, quantize=True,
                   calibration_batches=calib)
    # at least one int8 kernel actually sharded over 'model'
    leaves = jax.tree_util.tree_leaves(pm.variables)
    assert any(
        v.ndim == 4 and v.dtype == jnp.int8
        and "model" in tuple(v.sharding.spec) for v in leaves
    )
    ps = Predictor(str(ckpt), dtype=None, buckets=(8,),
                   quantize=True, calibration_batches=calib)
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    (preds_m, probs_m, unc_m), (preds_s, probs_s, unc_s) = pm(x), ps(x)
    # int8 tensors are exact through the conv stack; the only float
    # reassociation is the f32 head contraction over sharded channels
    np.testing.assert_allclose(probs_m, probs_s, rtol=0, atol=1e-5)
    np.testing.assert_allclose(unc_m, unc_s, rtol=0, atol=2e-5)
    np.testing.assert_array_equal(preds_m, preds_s)


@pytest.mark.slow
def test_tp_mesh_quantized_cls(tmp_path, rng):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    module = HerlevClassificationModel(stage=1, num_classes=7)
    v = module.init(jax.random.key(3), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = save_checkpoint(tmp_path / "cls1tq", v, metadata={"stage": 1})
    m = make_mesh(n_data=2, n_model=2)
    calib = [rng.random((4, 32, 32, 3)).astype(np.float32)]
    pm = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,), mesh=m, shard_model=True,
                   quantize=True, calibration_batches=calib)
    ps = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,),
                   quantize=True, calibration_batches=calib)
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    (lab_m, prob_m), (lab_s, prob_s) = pm(x), ps(x)
    np.testing.assert_array_equal(lab_m, lab_s)
    np.testing.assert_allclose(prob_m, prob_s, atol=1e-5)


def test_mesh_classification_predictor_matches(tmp_path, mesh, rng):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    module = HerlevClassificationModel(stage=1, num_classes=7)
    v = module.init(jax.random.key(1), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = save_checkpoint(tmp_path / "cls1", v, metadata={"stage": 1})
    pm = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,), mesh=mesh)
    ps = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,))
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    (lab_m, prob_m), (lab_s, prob_s) = pm(x), ps(x)
    np.testing.assert_array_equal(lab_m, lab_s)
    np.testing.assert_allclose(prob_m, prob_s, atol=1e-6)


def test_mesh_predictor_export_roundtrip(ckpt, mesh, rng, tmp_path):
    """export() from a mesh predictor yields a single-device artifact with
    identical outputs."""
    from ugpg_tpu.eval.exported import ExportedPredictor

    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh)
    art = pm.export(tmp_path / "art", platforms=("cpu",))
    pe = ExportedPredictor(art)
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    for a, b in zip(pm(x), pe(x)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_mesh_predictor_stream_matches_call(ckpt, mesh, rng):
    """stream() under a mesh prefetches straight to the per-chip shards (no
    chip-0 staging hop) and yields exactly what __call__ returns, ragged
    final batch included."""
    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh)
    xs = [rng.random((8, 32, 32, 3)).astype(np.float32) for _ in range(2)]
    xs.append(rng.random((5, 32, 32, 3)).astype(np.float32))  # ragged
    got = list(pm.stream(iter(xs)))
    assert len(got) == 3
    for x, outs in zip(xs, got):
        for a, b in zip(outs, pm(x)):
            assert a.shape[0] == x.shape[0]
            np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_serve_cli_resolve_buckets(mesh):
    """Default buckets are per-chip and scale with the data axis (bucket 1
    could never divide an 8-way mesh); explicit off-axis buckets get a
    CLI-level error."""
    from ugpg_tpu.cli.serve import resolve_buckets

    assert resolve_buckets(None, None) == [1, 8, 64]
    assert resolve_buckets(None, mesh) == [8, 64, 512]
    assert resolve_buckets([8, 16], mesh) == [8, 16]
    with pytest.raises(SystemExit, match="do not divide"):
        resolve_buckets([1, 8], mesh)


def test_parse_mesh_accepts_bare_data_axis():
    """The shared CLI mesh grammar: 'N' == 'N,1'; junk is a CLI error."""
    from ugpg_tpu.cli.train_monuseg import parse_mesh

    m = parse_mesh("8")
    assert dict(m.shape) == {"data": 8, "model": 1}
    assert parse_mesh(None) is None
    with pytest.raises(SystemExit, match="DATA"):
        parse_mesh("1,2,3")


def test_mesh_quantized_predictor_matches_single_device(ckpt, mesh, rng):
    """int8 W8A8 under the DP mesh: qparams replicate (per-channel scales
    intact), batch shards over 'data' — exact match vs one-chip int8."""
    calib = [rng.random((4, 32, 32, 3)).astype(np.float32)]
    pm = Predictor(str(ckpt), dtype=None, buckets=(8,), mesh=mesh,
                   quantize=True, calibration_batches=calib)
    ps = Predictor(str(ckpt), dtype=None, buckets=(8,),
                   quantize=True, calibration_batches=calib)
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    for a, b in zip(pm(x), ps(x)):
        np.testing.assert_allclose(a, b, rtol=0, atol=1e-6)


def test_mesh_quantized_cls_predictor_matches(tmp_path, mesh, rng):
    from ugpg_tpu.models.classifier import HerlevClassificationModel

    module = HerlevClassificationModel(stage=1, num_classes=7)
    v = module.init(jax.random.key(2), jnp.zeros((1, 32, 32, 3)), False)
    ckpt = save_checkpoint(tmp_path / "cls1q", v, metadata={"stage": 1})
    calib = [rng.random((4, 32, 32, 3)).astype(np.float32)]
    pm = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,), mesh=mesh,
                   quantize=True, calibration_batches=calib)
    ps = Predictor(str(ckpt), task_type="classification", num_classes=7,
                   dtype=None, buckets=(8,),
                   quantize=True, calibration_batches=calib)
    x = rng.random((8, 32, 32, 3)).astype(np.float32)
    (lab_m, prob_m), (lab_s, prob_s) = pm(x), ps(x)
    np.testing.assert_array_equal(lab_m, lab_s)
    np.testing.assert_allclose(prob_m, prob_s, atol=1e-6)

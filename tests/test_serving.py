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

"""Activation rematerialization (``remat=True``) correctness + memory.

``remat`` wraps every DoubleConv in ``jax.checkpoint`` (flax ``nn.remat``):
the backward pass recomputes block-internal activations instead of storing
them.  Contract under test:

* the lifted transform is invisible to state: identical param/batch_stats
  trees, identical init values;
* gradients, loss, and BN running-stat updates are bit-identical to the
  non-remat path (same ops, same order — remat only changes what is saved);
* XLA's compiled-program memory analysis shows a strictly smaller
  temp-buffer (activation) footprint for the remat gradient program.
"""

import jax
import jax.numpy as jnp
import numpy as np

from ugpg_tpu.models.classifier import HerlevClassificationModel
from ugpg_tpu.models.pgunet import PGUNet2


def _leaves(tree):
    return jax.tree_util.tree_leaves(tree)


def _trees_bitequal(a, b):
    la, lb = _leaves(a), _leaves(b)
    assert len(la) == len(lb)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(la, lb))


def _seg_loss_fn(module, x, y):
    def f(params, batch_stats):
        logits, upd = module.apply(
            {"params": params, "batch_stats": batch_stats}, x, True,
            mutable=["batch_stats"],
        )
        p = jax.nn.sigmoid(logits.astype(jnp.float32))
        loss = jnp.mean((p - y) ** 2)
        return loss, upd["batch_stats"]

    return f


def test_remat_state_tree_and_grads_identical_seg():
    x = jnp.asarray(np.random.RandomState(0).rand(2, 32, 32, 3), jnp.float32)
    y = jnp.asarray(np.random.RandomState(1).rand(2, 32, 32, 1), jnp.float32)

    plain = PGUNet2(num_classes=1)
    remat = PGUNet2(num_classes=1, remat=True)
    v_plain = plain.init(jax.random.key(0), x, False)
    v_remat = remat.init(jax.random.key(0), x, False)

    assert jax.tree_util.tree_structure(v_plain) == jax.tree_util.tree_structure(v_remat)
    assert _trees_bitequal(v_plain, v_remat)

    (l1, bs1), g1 = jax.jit(
        jax.value_and_grad(_seg_loss_fn(plain, x, y), has_aux=True)
    )(v_plain["params"], v_plain["batch_stats"])
    (l2, bs2), g2 = jax.jit(
        jax.value_and_grad(_seg_loss_fn(remat, x, y), has_aux=True)
    )(v_remat["params"], v_remat["batch_stats"])

    assert float(l1) == float(l2)
    assert _trees_bitequal(g1, g2)
    assert _trees_bitequal(bs1, bs2)


def test_remat_grads_identical_cls():
    x = jnp.asarray(np.random.RandomState(2).rand(2, 32, 32, 3), jnp.float32)

    plain = HerlevClassificationModel(stage=1, num_classes=7)
    remat = HerlevClassificationModel(stage=1, num_classes=7, remat=True)
    v = plain.init(jax.random.key(0), x, False)
    assert _trees_bitequal(v, remat.init(jax.random.key(0), x, False))

    def loss_fn(module):
        def f(params, batch_stats):
            logits, upd = module.apply(
                {"params": params, "batch_stats": batch_stats}, x, True,
                mutable=["batch_stats"],
                rngs={"dropout": jax.random.key(3)},
            )
            return jnp.mean(logits.astype(jnp.float32) ** 2), upd["batch_stats"]

        return f

    (l1, bs1), g1 = jax.jit(jax.value_and_grad(loss_fn(plain), has_aux=True))(
        v["params"], v["batch_stats"]
    )
    (l2, bs2), g2 = jax.jit(jax.value_and_grad(loss_fn(remat), has_aux=True))(
        v["params"], v["batch_stats"]
    )
    assert float(l1) == float(l2)
    assert _trees_bitequal(g1, g2)
    assert _trees_bitequal(bs1, bs2)


def test_remat_recomputes_blocks_in_backward():
    """Structural check at the jaxpr level: the gradient of a remat model
    contains one ``remat`` eqn per DoubleConv and RECOMPUTES both of each
    block's convolutions (2 extra convs per block vs the plain gradient).

    The check is at jaxpr level deliberately: XLA:CPU's late pipeline drops
    the optimization barriers and CSEs the recomputation back out (measured:
    identical optimized HLO), so compiled-memory assertions are meaningless
    on the CPU test backend.  On TPU, buffer assignment honors the remat
    schedule — the measured activation-memory numbers live in BASELINE.md
    (tools/ab_remat.py).
    """
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    y = jnp.zeros((2, 32, 32, 1), jnp.float32)

    counts = {}
    for name, module in {
        "plain": PGUNet2(num_classes=1),
        "remat": PGUNet2(num_classes=1, remat=True),
    }.items():
        v = module.init(jax.random.key(0), x, False)
        jaxpr = str(
            jax.make_jaxpr(
                jax.value_and_grad(_seg_loss_fn(module, x, y), has_aux=True)
            )(v["params"], v["batch_stats"])
        )
        counts[name] = (jaxpr.count("conv_general_dilated"), jaxpr.count("remat"))

    n_blocks = 5  # PGUNet2: inc, down3, down4, up1, up2
    assert counts["plain"][1] == 0
    assert counts["remat"][1] >= n_blocks, counts
    assert counts["remat"][0] == counts["plain"][0] + 2 * n_blocks, counts

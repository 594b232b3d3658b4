"""Optimizers with exact torch update math (SURVEY.md §7 hard-part #5).

The reference trains with:
* ``optim.RMSprop(lr, weight_decay=1e-4)`` for segmentation
  (ref: uncertainty_guided_trainer.py:81-88)
* ``optim.Adam(lr, weight_decay=1e-4)`` + ``ReduceLROnPlateau(0.5, 5)`` for
  classification (ref: Herlev/train_herlev.py:183-194)

optax's built-ins differ from torch in eps placement (optax ``scale_by_rms``
adds eps *inside* the sqrt; torch adds it *outside*) and in weight-decay
coupling (torch folds ``wd * p`` into the gradient *before* the moment
updates — classic L2, not AdamW).  These transforms reproduce torch exactly:

torch RMSprop (alpha=0.99, eps=1e-8, no momentum/centering):
    g <- g + wd * p
    v <- alpha * v + (1 - alpha) * g^2
    p <- p - lr * g / (sqrt(v) + eps)

torch Adam (b1=0.9, b2=0.999, eps=1e-8):
    g <- g + wd * p
    m <- b1 * m + (1 - b1) * g ;  v <- b2 * v + (1 - b2) * g^2
    p <- p - lr * (m / (1 - b1^t)) / (sqrt(v / (1 - b2^t)) + eps)

Learning rates are injected via ``optax.inject_hyperparams`` so the host-side
``ReduceLROnPlateau`` scheduler can mutate ``opt_state.hyperparams['lr']``
without recompiling the jitted train step.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "torch_rmsprop",
    "torch_adam",
    "ReduceLROnPlateau",
    "set_learning_rate",
    "get_learning_rate",
    "freeze_subtrees",
]


def _add_weight_decay(weight_decay: float) -> optax.GradientTransformation:
    """L2-style coupled decay: g += wd * p (applied before moment updates)."""
    if weight_decay == 0.0:
        return optax.identity()
    return optax.add_decayed_weights(weight_decay)


def _scale_by_torch_rms(alpha: float, eps: float) -> optax.GradientTransformation:
    def init(params):
        return {"nu": jax.tree.map(jnp.zeros_like, params)}

    def update(updates, state, params=None):
        nu = jax.tree.map(
            lambda v, g: alpha * v + (1.0 - alpha) * g * g, state["nu"], updates
        )
        updates = jax.tree.map(lambda g, v: g / (jnp.sqrt(v) + eps), updates, nu)
        return updates, {"nu": nu}

    return optax.GradientTransformation(init, update)


def _scale_by_torch_adam(b1: float, b2: float, eps: float) -> optax.GradientTransformation:
    def init(params):
        return {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(jnp.zeros_like, params),
            "nu": jax.tree.map(jnp.zeros_like, params),
        }

    def update(updates, state, params=None):
        count = state["count"] + 1
        t = count.astype(jnp.float32)
        mu = jax.tree.map(lambda m, g: b1 * m + (1.0 - b1) * g, state["mu"], updates)
        nu = jax.tree.map(lambda v, g: b2 * v + (1.0 - b2) * g * g, state["nu"], updates)
        bc1 = 1.0 - b1**t
        bc2 = 1.0 - b2**t
        updates = jax.tree.map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mu, nu
        )
        return updates, {"count": count, "mu": mu, "nu": nu}

    return optax.GradientTransformation(init, update)


# The factories below are memoized: trainers rebuild "a fresh optimizer" at
# every stage entry (reference semantics — fresh STATE), but the transform
# object itself is a pure function of its hyperparameters.  Returning the
# same object lets jit caches (tx.init / step programs closing over tx)
# hit across stages and across trainer instances instead of re-tracing —
# state freshness is unaffected (state lives in TrainState, not in tx).


@lru_cache(maxsize=64)
def torch_rmsprop(
    learning_rate: float,
    alpha: float = 0.99,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.RMSprop parity (no momentum, non-centered)."""
    if learning_rate is None:
        raise ValueError("learning_rate must be a number, got None")

    @optax.inject_hyperparams
    def make(lr):
        return optax.chain(
            _add_weight_decay(weight_decay),
            _scale_by_torch_rms(alpha, eps),
            optax.scale_by_learning_rate(lr),
        )

    return make(lr=learning_rate)


@lru_cache(maxsize=64)
def torch_adam(
    learning_rate: float,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """torch.optim.Adam parity (L2-coupled weight decay, not AdamW)."""
    if learning_rate is None:
        raise ValueError("learning_rate must be a number, got None")

    @optax.inject_hyperparams
    def make(lr):
        return optax.chain(
            _add_weight_decay(weight_decay),
            _scale_by_torch_adam(b1, b2, eps),
            optax.scale_by_learning_rate(lr),
        )

    return make(lr=learning_rate)


def _find_hyperparam_dicts(state, out):
    """Recursively locate InjectHyperparamsState.hyperparams dicts (they can
    be nested under multi_transform/masked wrappers)."""
    if hasattr(state, "hyperparams") and isinstance(state.hyperparams, dict):
        out.append(state.hyperparams)
    if isinstance(state, (tuple, list)):
        for item in state:
            _find_hyperparam_dicts(item, out)
    elif isinstance(state, dict):
        for item in state.values():
            _find_hyperparam_dicts(item, out)
    elif hasattr(state, "_fields"):
        for name in state._fields:
            _find_hyperparam_dicts(getattr(state, name), out)
    elif hasattr(state, "inner_states"):
        _find_hyperparam_dicts(state.inner_states, out)
    return out


def get_learning_rate(opt_state) -> float:
    dicts = _find_hyperparam_dicts(opt_state, [])
    if not dicts:
        raise ValueError("no injected hyperparams found in optimizer state")
    return float(dicts[0]["lr"])


def set_learning_rate(opt_state, lr: float):
    for hp in _find_hyperparam_dicts(opt_state, []):
        if "lr" in hp:
            hp["lr"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state


def freeze_subtrees(
    tx: optax.GradientTransformation, frozen_roots: tuple[str, ...]
) -> optax.GradientTransformation:
    """Apply ``tx`` everywhere except under the named top-level subtrees,
    which receive zero updates.

    The TPU-functional equivalent of the reference's
    ``param.requires_grad = False`` encoder freeze
    (ref: Herlev/train_herlev.py:104-112).
    """

    def label(params):
        return {
            k: ("frozen" if k in frozen_roots else "train")
            for k in params.keys()
        }

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, label
    )


@dataclass
class ReduceLROnPlateau:
    """Host-side parity of torch.optim.lr_scheduler.ReduceLROnPlateau.

    mode='min', default threshold semantics ('rel', 1e-4), cooldown=0.
    Call ``step(metric, opt_state)`` once per epoch; it mutates the injected
    ``lr`` hyperparameter in-place and returns the (possibly updated) state.
    """

    factor: float = 0.5
    patience: int = 5
    threshold: float = 1e-4
    min_lr: float = 0.0
    best: float = field(default=float("inf"), init=False)
    num_bad_epochs: int = field(default=0, init=False)

    def _is_better(self, metric: float) -> bool:
        return metric < self.best * (1.0 - self.threshold)

    def step(self, metric: float, opt_state):
        if self._is_better(metric):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = max(get_learning_rate(opt_state) * self.factor, self.min_lr)
            opt_state = set_learning_rate(opt_state, new_lr)
            self.num_bad_epochs = 0
        return opt_state

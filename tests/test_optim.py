"""Optimizer update-math parity vs torch (SURVEY.md §7 hard-part #5)."""

import numpy as np
import torch

import jax
import jax.numpy as jnp
import optax

from ugpg_tpu.train.optim import (
    ReduceLROnPlateau,
    get_learning_rate,
    set_learning_rate,
    torch_adam,
    torch_rmsprop,
)


def _run_parity(make_torch_opt, make_jax_opt, steps=5, wd=1e-4):
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(steps)]

    # torch side
    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    topt = make_torch_opt([tp])
    for g in grads:
        topt.zero_grad()
        tp.grad = torch.from_numpy(g.copy())
        topt.step()

    # jax side
    params = {"w": jnp.asarray(p0)}
    opt = make_jax_opt()
    state = opt.init(params)
    for g in grads:
        updates, state = opt.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=2e-5, atol=2e-6
    )


def test_rmsprop_matches_torch():
    _run_parity(
        lambda ps: torch.optim.RMSprop(ps, lr=3e-4, weight_decay=1e-4),
        lambda: torch_rmsprop(3e-4, weight_decay=1e-4),
    )


def test_rmsprop_no_decay():
    _run_parity(
        lambda ps: torch.optim.RMSprop(ps, lr=1e-3),
        lambda: torch_rmsprop(1e-3),
        steps=8,
    )


def test_adam_matches_torch():
    _run_parity(
        lambda ps: torch.optim.Adam(ps, lr=3e-4, weight_decay=1e-4),
        lambda: torch_adam(3e-4, weight_decay=1e-4),
        steps=7,
    )


def test_lr_injection_roundtrip():
    opt = torch_rmsprop(3e-4)
    state = opt.init({"w": jnp.zeros(3)})
    assert abs(get_learning_rate(state) - 3e-4) < 1e-9
    state = set_learning_rate(state, 1.5e-4)
    assert abs(get_learning_rate(state) - 1.5e-4) < 1e-9


def test_plateau_scheduler_matches_torch():
    """Drive both schedulers with the same loss sequence."""
    losses = [1.0, 0.9, 0.91, 0.92, 0.93, 0.94, 0.95, 0.96, 0.5, 0.6, 0.6, 0.6,
              0.6, 0.6, 0.6, 0.6]

    tp = torch.nn.Parameter(torch.zeros(1))
    topt = torch.optim.Adam([tp], lr=1e-3)
    tsched = torch.optim.lr_scheduler.ReduceLROnPlateau(
        topt, mode="min", factor=0.5, patience=5
    )

    opt = torch_adam(1e-3)
    state = opt.init({"w": jnp.zeros(1)})
    sched = ReduceLROnPlateau(factor=0.5, patience=5)

    for loss in losses:
        tsched.step(loss)
        state = sched.step(loss, state)
        torch_lr = topt.param_groups[0]["lr"]
        np.testing.assert_allclose(get_learning_rate(state), torch_lr, rtol=1e-6)

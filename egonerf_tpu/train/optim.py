"""Optimizer: Adam with per-parameter-group learning rates and per-step
exponential decay.

Matches the reference's schedule — Adam(betas=(0.9, 0.99)), group lrs
{grids: lr_init, decoder: lr_basis, envmap: lr_envmap}, multiplied by
``lr_decay_target_ratio ** (step / lr_decay_iters)`` every step
(reference: train.py:172-186, 328-329) — expressed as one optax chain so
the whole update runs inside the jitted train step.
"""
from __future__ import annotations

from typing import Optional

import jax
import optax

NETWORK_KEYS = ("basis", "shader")


def lr_group_of(path) -> str:
    """envmap / network (basis matrices + shader MLP) / grid — everything
    not matched explicitly is a grid tensor (the fallthrough IS the grid
    rule; there is no grid key list to keep in sync)."""
    top = path[0].key if hasattr(path[0], "key") else str(path[0])
    if top == "envmap":
        return "envmap"
    if any(k in top for k in NETWORK_KEYS):
        return "network"
    return "grid"


def build_lr_tree(params, lr_grid: float, lr_network: float, lr_envmap: float):
    def leaf_lr(path, _leaf):
        return {"grid": lr_grid, "network": lr_network, "envmap": lr_envmap}[lr_group_of(path)]

    return jax.tree_util.tree_map_with_path(leaf_lr, params)


def _scale_by_tree(lr_tree) -> optax.GradientTransformation:
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return jax.tree.map(lambda u, lr: u * lr, updates, lr_tree), state

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(params, lr_grid: float, lr_network: float, lr_envmap: float,
                   decay_target_ratio: float = 0.1,
                   decay_iters: Optional[int] = None) -> optax.GradientTransformation:
    """lr(step) = lr_group * decay_target_ratio ** (step / decay_iters)."""
    lr_tree = build_lr_tree(params, lr_grid, lr_network, lr_envmap)
    if decay_iters and decay_iters > 0 and decay_target_ratio < 1.0:
        factor = decay_target_ratio ** (1.0 / decay_iters)
        schedule = lambda count: -(factor ** count)
    else:
        schedule = lambda count: -1.0
    return optax.chain(
        optax.scale_by_adam(b1=0.9, b2=0.99),
        _scale_by_tree(lr_tree),
        optax.scale_by_schedule(schedule),
    )


def fast_forward_schedule(opt_state, step: int):
    """Resume support: advance the decay schedule's step counter so a
    restored run continues with the decayed lr (reference: train.py:182)."""
    import jax.numpy as jnp

    def bump(state):
        if isinstance(state, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(count=jnp.asarray(step, jnp.int32))
        return state

    return jax.tree_util.tree_map(
        bump, opt_state, is_leaf=lambda s: isinstance(s, optax.ScaleByScheduleState)
    )

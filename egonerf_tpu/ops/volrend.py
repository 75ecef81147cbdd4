"""Volume-rendering primitives.

(reference: models/tensorBase.py:22-27 ``raw2alpha``; the composite sums at
models/EgoNeRF.py:579-598)
"""
from __future__ import annotations

import jax.numpy as jnp


def raw2alpha(sigma: jnp.ndarray, dist: jnp.ndarray):
    """sigma, dist: (..., S) -> (alpha, weights, bg_weight).

    alpha = 1 - exp(-sigma*dist); T = prefix-prod of (1 - alpha + 1e-10);
    weights = alpha * T_exclusive; bg_weight = T over the whole ray.
    The transmittance scan is a cumprod along the sample axis — XLA lowers
    it to a log-depth scan on TPU.
    """
    alpha = 1.0 - jnp.exp(-sigma * dist)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    t_excl = jnp.concatenate([jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * t_excl
    bg_weight = trans[..., -1:]
    return alpha, weights, bg_weight


def ray_entropy(alpha: jnp.ndarray) -> jnp.ndarray:
    """InfoNeRF-style ray entropy regularizer
    (reference: utils.py:175-183)."""
    prob = alpha / (jnp.sum(alpha, axis=-1, keepdims=True) + 1e-10)
    ent = -jnp.sum(prob * jnp.log2(prob + 1e-10), axis=-1)
    return jnp.mean(ent)

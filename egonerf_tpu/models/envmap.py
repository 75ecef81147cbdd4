"""Learnable far-field environment map.

An equirectangular emission grid sampled by view direction; sigmoid keeps
radiance in [0, 1].  (reference: models/envmap.py:6-37)

Storage is channel-last ``(2h, h, 3)`` indexed by (v=phi row, u=cos-theta
column) — the same lattice as the reference's (3, 2h, h) grid-sampled with
x=u, y=v.
"""
from __future__ import annotations

from math import pi

import jax
import jax.numpy as jnp

from ..ops.grid_sample import sample_plane


def direction_to_canonical(direction: jnp.ndarray) -> jnp.ndarray:
    """Unit-normalize then map to (u, v) in [0,1]^2:
    u = (cos theta + 1)/2 with cos theta = z; v = (atan2(y,x)+pi)/2pi."""
    d = direction / jnp.linalg.norm(direction, axis=-1, keepdims=True)
    cos_theta = d[..., 2]
    phi = jnp.arctan2(d[..., 1], d[..., 0]) + pi
    u = (cos_theta + 1.0) * 0.5
    v = phi / (2.0 * pi)
    return jnp.stack([u, v], axis=-1)


def init_envmap(key, h: int, init_strategy: str = "random") -> jnp.ndarray:
    if init_strategy == "random":
        return jax.random.uniform(key, (2 * h, h, 3))
    if init_strategy == "zero":
        return jnp.zeros((2 * h, h, 3))
    raise ValueError(f"Unknown environment map initialization: {init_strategy}")


def envmap_radiance(emission: jnp.ndarray, direction: jnp.ndarray) -> jnp.ndarray:
    """emission: (2h, h, 3); direction: (N, 3) -> (N, 3) in [0, 1]."""
    uv = direction_to_canonical(direction) * 2.0 - 1.0
    raw = sample_plane(emission[None], uv[..., 0], uv[..., 1])
    return jax.nn.sigmoid(raw)

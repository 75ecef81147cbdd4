"""Frequency positional encoding.

(reference: models/tensorBase.py:14-19 — note the (D, F) flattening order:
for input dim d and frequency f the flat index is d*F + f, then sin block
followed by cos block.)
"""
from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(positions: jnp.ndarray, freqs: int) -> jnp.ndarray:
    """positions: (..., D) -> (..., 2*D*freqs)."""
    bands = (2.0 ** jnp.arange(freqs)).astype(positions.dtype)
    pts = (positions[..., None] * bands).reshape(*positions.shape[:-1], -1)
    return jnp.concatenate([jnp.sin(pts), jnp.cos(pts)], axis=-1)

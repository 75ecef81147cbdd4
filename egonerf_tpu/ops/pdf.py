"""Hierarchical inverse-CDF resampling.

(reference: dataLoader/ray_utils.py:156-187 ``sample_pdf``)
Static-shape, vmapped searchsorted; gradients are cut by construction — the
caller treats the returned depths as constants, matching the reference's
``fine_z_samples.detach()`` (reference: models/EgoNeRF.py:534).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def sample_pdf(bins: jnp.ndarray, weights: jnp.ndarray, n_samples: int,
               key=None) -> jnp.ndarray:
    """Draw ``n_samples`` depths per ray from the piecewise-constant pdf.

    Args:
      bins:    (N, B) bin edges (midpoints of the coarse z-vals).
      weights: (N, B-1) unnormalized pdf mass per bin interval.
      n_samples: number of samples per ray.
      key: PRNG key for stratified-uniform draws; ``None`` uses the
        deterministic linspace grid (eval mode,
        reference: dataLoader/ray_utils.py:165-167).
    Returns:
      (N, n_samples) depths.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # (N, B)

    n = cdf.shape[0]
    if key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype), (n, n_samples))
    else:
        u = jax.random.uniform(key, (n, n_samples), dtype=cdf.dtype)

    cdf = jax.lax.stop_gradient(cdf)
    inds = jax.vmap(
        lambda c, uu: jnp.searchsorted(c, uu, side="right", method="compare_all")
    )(cdf, u)
    below = jnp.maximum(inds - 1, 0)
    above = jnp.minimum(inds, cdf.shape[-1] - 1)

    cdf_lo = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_hi = jnp.take_along_axis(cdf, above, axis=-1)
    bins_lo = jnp.take_along_axis(bins, below, axis=-1)
    bins_hi = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)

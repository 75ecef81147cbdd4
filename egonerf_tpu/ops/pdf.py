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
               key=None, sorted_draws: bool = False) -> jnp.ndarray:
    """Draw ``n_samples`` depths per ray from the piecewise-constant pdf.

    Args:
      bins:    (N, B) bin edges (midpoints of the coarse z-vals).
      weights: (N, B-1) unnormalized pdf mass per bin interval.
      n_samples: number of samples per ray.
      key: PRNG key for stratified-uniform draws; ``None`` uses the
        deterministic linspace grid (eval mode,
        reference: dataLoader/ray_utils.py:165-167).
      sorted_draws: draw the uniforms already sorted (order-statistics
        construction, ops/merge.py) so the returned depths are sorted
        per ray — same joint law as sorting the reference's iid draws,
        and it lets the caller merge with the coarse depths via a
        bitonic merge instead of a full sort.
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
    elif sorted_draws:
        from .merge import sorted_uniform

        u = sorted_uniform(key, (n, n_samples)).astype(cdf.dtype)
    else:
        u = jax.random.uniform(key, (n, n_samples), dtype=cdf.dtype)

    cdf = jax.lax.stop_gradient(cdf)

    # Gather-free bracketing.  cdf is strictly increasing (weights floored
    # at 1e-5) and bins is strictly increasing per ray, so the bin edges
    # around each u are masked min/max REDUCTIONS over the bin axis instead
    # of searchsorted + 4 take_along_axis gathers — TPU gathers cost
    # ~12-18 ns *per index* (BASELINE.md cost model) and the four 524k-index
    # gathers dominated this function (~27 ms/step of the production
    # trace, tools/profile_step.py); the reductions fuse into one
    # broadcast-compare pass on the VPU.  Equivalent to
    # inds = searchsorted(cdf, u, side='right'); below = inds-1;
    # above = min(inds, B-1)  (inds >= 1 always since cdf[0] = 0 <= u).
    cmp = cdf[..., None, :] <= u[..., :, None]  # (N, n_samples, B)
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)
    cdf_b = cdf[..., None, :]
    bins_b = bins[..., None, :]
    cdf_lo = jnp.max(jnp.where(cmp, cdf_b, neg), axis=-1)
    bins_lo = jnp.max(jnp.where(cmp, bins_b, neg), axis=-1)
    cdf_hi = jnp.min(jnp.where(cmp, pos, cdf_b), axis=-1)
    bins_hi = jnp.min(jnp.where(cmp, pos, bins_b), axis=-1)
    # u >= cdf[-1] (can happen when rounding leaves cdf[-1] < 1): the
    # 'above' bracket clamps to the last edge
    cdf_hi = jnp.where(jnp.isfinite(cdf_hi), cdf_hi, cdf_lo)
    bins_hi = jnp.where(jnp.isfinite(bins_hi), bins_hi, bins_lo)

    denom = cdf_hi - cdf_lo
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_lo) / denom
    return bins_lo + t * (bins_hi - bins_lo)

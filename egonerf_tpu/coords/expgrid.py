"""Exponential radial grid math.

The balanced spherical grid spaces its radial cells exponentially so that
every cell subtends a roughly constant solid angle from the egocentric
origin.  ``interval_th`` optionally clamps the near-field spacing to a
constant ``r0`` so the first cells do not collapse to sub-resolvable sizes.

Semantics match the reference implementation exactly
(reference: extra/test_exp_r.py:10-15, models/coordinates.py:110-156,
models/EgoNeRF.py:69-76) but are expressed as pure functions: the grid is a
precomputed constant array (shape-static, baked into the jitted program) and
the per-sample normalization is searchsorted + lerp on it.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def index2r(r0: float, ratio: float, index):
    """Radial position of grid index k: 0 -> 0, k>=1 -> r0 * ratio**(k-1).

    Works on numpy or jax arrays. (reference: extra/test_exp_r.py:10-15)
    """
    xp = jnp if isinstance(index, jnp.ndarray) else np
    idx = xp.asarray(index, dtype=xp.float32)
    r = xp.where(idx > 0, r0 * ratio ** (idx - 1.0), 0.0)
    return r.astype(xp.float32)


def exp_ratio(r0: float, far: float, n: int) -> float:
    """ratio such that r0 * ratio**(n-1) == far."""
    return float(np.exp(np.log(far / r0) / (n - 1)))


def apply_interval_th(grid: np.ndarray, r0: float) -> np.ndarray:
    """Splice a constant-spacing prefix into an exponential grid.

    Every leading interval <= r0 is replaced by spacing exactly r0 and the
    exponential tail is shifted to stay continuous.  With ``m`` clamped
    intervals the result is::

        g[k] = k * r0                          for k <= m
        g[k] = grid[k] + (m*r0 - grid[m])      for k >  m

    (reference: models/coordinates.py:119-124, extra/test_exp_r.py:24-28)
    """
    # float32 throughout: the clamp count m depends on an exact
    # interval <= r0 comparison at the first cell, which only holds in the
    # reference's float32 arithmetic
    grid = np.asarray(grid, dtype=np.float32).copy()
    r0 = np.float32(r0)
    interval = grid[1:] - grid[:-1]
    m = int(np.sum(interval <= r0))
    out = grid.copy()
    out[: m + 1] = np.arange(m + 1, dtype=np.float32) * r0
    if m < len(grid) - 1:
        out[m + 1 :] = grid[m + 1 :] + (m * r0 - grid[m])
    return out


def make_reference_r_grid(r0: float, far: float, n_r: int) -> np.ndarray:
    """The (n_r+1)-point radial lookup grid used by interval_th
    normalization (reference: models/coordinates.py:118-124).

    ratio is derived from n_r (NOT n_r+1): ratio = (far/r0)**(1/(n_r-1)),
    then index2r is evaluated on 0..n_r and the constant prefix spliced in.
    The last point can slightly exceed ``far`` after the splice — that is
    intentional and matches the reference.
    """
    ratio = exp_ratio(r0, far, n_r)
    grid = index2r(r0, ratio, np.arange(n_r + 1))
    return apply_interval_th(grid, r0)


def make_sample_r_grid(r0: float, span: float, n_samples: int) -> np.ndarray:
    """The n_samples-point radial *ray sampling* grid for interval_th mode
    (reference: models/EgoNeRF.py:69-76).

    Spans [0, ~span] with ratio = exp(log(span/r0)/(n_samples-1)) evaluated
    on indices 0..n_samples-1 (so the last point is span/ratio before the
    splice), then the constant prefix is spliced in.
    """
    ratio = exp_ratio(r0, span, n_samples)
    grid = index2r(r0, ratio, np.arange(n_samples))
    return apply_interval_th(grid, r0)


def normalize_r_lookup(r, grid) -> jnp.ndarray:
    """Map radius -> normalized [0, 1] coordinate via the reference grid.

    ``grid`` has n_r+1 monotically increasing entries; the result is
    (cell_index + lerp_fraction) / n_r.
    (reference: models/coordinates.py:125-131)
    """
    grid = jnp.asarray(grid)
    n_r = grid.shape[0] - 1
    # Gather-free bracketing: the grid is tiny (n_r+1 entries) and strictly
    # increasing, so the bracketing cell is a broadcast compare + masked
    # min/max REDUCTION — no per-sample grid[lo]/grid[hi] gathers, which at
    # ~12-18 ns/index dominated this function on the 1M-sample production
    # step (tools/profile_step.py).  Equivalent to
    # hi = clip(searchsorted(grid, r, side='right'), 1, n_r); lo = hi-1.
    cmp = grid <= r[..., None]                      # (..., n_r+1)
    lo = jnp.clip(jnp.sum(cmp, axis=-1) - 1, 0, n_r - 1)
    # restrict the lo-candidates to index <= n_r-1 so the upper clip holds
    # (grid[0] = 0 <= r always, so the masked max is never empty)
    neg = jnp.float32(-jnp.inf)
    pos = jnp.float32(jnp.inf)
    g_lo = jnp.max(jnp.where(cmp[..., :-1], grid[:-1], neg), axis=-1)
    g_hi = jnp.min(jnp.where(grid > g_lo[..., None], grid, pos), axis=-1)
    t = (r - g_lo) / (g_hi - g_lo)
    return (lo.astype(r.dtype) + t) / n_r


def normalize_r_exp(r, r0: float, ratio: float, n_r: int) -> jnp.ndarray:
    """Closed-form exponential normalization (non-interval_th path).

    k = trunc(log(r/r0)/log(ratio)); cells below r0 lerp linearly in
    [0, r0] -> [0, 1/n_r].  (reference: models/coordinates.py:141-156)
    """
    r = jnp.asarray(r)
    safe_r = jnp.maximum(r, 1e-12)
    k = (jnp.log(safe_r / r0) / np.log(ratio)).astype(jnp.int32)  # trunc
    below = r < r0
    r_in = jnp.where(below, 0.0, r0 * ratio ** k.astype(r.dtype))
    r_out = jnp.where(below, r0, r0 * ratio ** (k + 1).astype(r.dtype))
    t = (r - r_in) / (r_out - r_in)
    norm = jnp.where(below, r / r0, 1.0 + k.astype(r.dtype) + t)
    return norm / n_r

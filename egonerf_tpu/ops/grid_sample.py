"""Bilinear grid sampling for vector-matrix factorized fields.

This replaces the reference's ``F.grid_sample`` CUDA kernel
(reference: models/EgoNeRF.py:336-346, models/tensorBase.py:50) with
gather-based XLA code shaped for the TPU:

* grids are stored **channel-last** — ``planes (S, H, W, C)``,
  ``lines (S, L, C)`` — so one gathered row is a contiguous C-vector;
* the yin/yang stack axis ``S`` is folded into the gather index, so a batch
  mixing both grids is one static-shape gather (flag-indexed) instead of the
  reference's two ragged boolean partitions;
* semantics match ``F.grid_sample(..., align_corners=True,
  padding_mode='zeros')``: out-of-range corners contribute zero.

Gradients flow through ``jnp.take`` as scatter-adds, which XLA fuses with
the surrounding elementwise work.
"""
from __future__ import annotations

import jax.numpy as jnp


def _corner(coord: jnp.ndarray, size: int, align_corners: bool = True):
    """Map [-1,1] -> pixel space; return (i0, i1, frac, valid0, valid1)."""
    if align_corners:
        p = (coord + 1.0) * 0.5 * (size - 1)
    else:
        p = ((coord + 1.0) * size - 1.0) * 0.5
    i0f = jnp.floor(p)
    t = p - i0f
    i0 = i0f.astype(jnp.int32)
    i1 = i0 + 1
    v0 = (i0 >= 0) & (i0 <= size - 1)
    v1 = (i1 >= 0) & (i1 <= size - 1)
    return jnp.clip(i0, 0, size - 1), jnp.clip(i1, 0, size - 1), t, v0, v1


def sample_line(lines: jnp.ndarray, coord: jnp.ndarray, sel=None) -> jnp.ndarray:
    """Linearly sample stacked 1-D grids.

    Args:
      lines: (S, L, C) stacked line coefficients.
      coord: (...,) normalized position in [-1, 1].
      sel:   (...,) int32 stack selector, or None when S == 1.
    Returns:
      (..., C) sampled features.
    """
    s, l, c = lines.shape
    flat = lines.reshape(s * l, c)
    i0, i1, t, v0, v1 = _corner(coord, l)
    base = jnp.zeros_like(i0) if sel is None else sel.astype(jnp.int32) * l
    f0 = jnp.take(flat, base + i0, axis=0)
    f1 = jnp.take(flat, base + i1, axis=0)
    w0 = ((1.0 - t) * v0)[..., None]
    w1 = (t * v1)[..., None]
    return f0 * w0 + f1 * w1


def sample_plane(planes: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, sel=None) -> jnp.ndarray:
    """Bilinearly sample stacked 2-D grids.

    Args:
      planes: (S, H, W, C) stacked plane coefficients; ``x`` indexes W,
        ``y`` indexes H (the reference's grid_sample (x, y) convention).
      x, y:  (...,) normalized positions in [-1, 1].
      sel:   (...,) int32 stack selector, or None when S == 1.
    Returns:
      (..., C) sampled features.
    """
    s, h, w, c = planes.shape
    flat = planes.reshape(s * h * w, c)
    x0, x1, tx, vx0, vx1 = _corner(x, w)
    y0, y1, ty, vy0, vy1 = _corner(y, h)
    base = jnp.zeros_like(x0) if sel is None else sel.astype(jnp.int32) * (h * w)

    def fetch(yi, xi):
        return jnp.take(flat, base + yi * w + xi, axis=0)

    f00 = fetch(y0, x0)
    f01 = fetch(y0, x1)
    f10 = fetch(y1, x0)
    f11 = fetch(y1, x1)
    w00 = ((1.0 - ty) * (1.0 - tx) * (vy0 & vx0))[..., None]
    w01 = ((1.0 - ty) * tx * (vy0 & vx1))[..., None]
    w10 = (ty * (1.0 - tx) * (vy1 & vx0))[..., None]
    w11 = (ty * tx * (vy1 & vx1))[..., None]
    return f00 * w00 + f01 * w01 + f10 * w10 + f11 * w11


def sample_volume(volume: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray, z: jnp.ndarray,
                  sel=None) -> jnp.ndarray:
    """Trilinearly sample stacked 3-D grids (used by alpha masks).

    Args:
      volume: (S, D, H, W, C); ``x`` indexes W, ``y`` H, ``z`` D — matching
        ``F.grid_sample`` 5-D convention where grid is (x, y, z)
        (reference: models/tensorBase.py:50).
    Returns:
      (..., C)
    """
    s, d, h, w, c = volume.shape
    flat = volume.reshape(s * d * h * w, c)
    x0, x1, tx, vx0, vx1 = _corner(x, w)
    y0, y1, ty, vy0, vy1 = _corner(y, h)
    z0, z1, tz, vz0, vz1 = _corner(z, d)
    base = jnp.zeros_like(x0) if sel is None else sel.astype(jnp.int32) * (d * h * w)

    def fetch(zi, yi, xi):
        return jnp.take(flat, base + (zi * h + yi) * w + xi, axis=0)

    out = 0.0
    for zi, tzv, vz in ((z0, 1.0 - tz, vz0), (z1, tz, vz1)):
        for yi, tyv, vy in ((y0, 1.0 - ty, vy0), (y1, ty, vy1)):
            for xi, txv, vx in ((x0, 1.0 - tx, vx0), (x1, tx, vx1)):
                wgt = (tzv * tyv * txv * (vz & vy & vx))[..., None]
                out = out + fetch(zi, yi, xi) * wgt
    return out

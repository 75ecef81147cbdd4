"""Alpha-mask machinery for the TensoRF baselines.

A baked binary occupancy volume sampled trilinearly to cull empty space
(reference: models/tensorBase.py:42-51, 349-413).  On TPU the mask gates
*values* (sigma forced to zero where empty) instead of gating compute —
static shapes beat ragged savings here — while ray filtering still prunes
the host-side ray buffer exactly like the reference.

The lookup itself is the engineered part: a naive trilinear fetch is
EIGHT per-sample gathers of 4-byte scalars — the pathological sub-128-byte
gather path (in-situ: +60 ms/step on the masked TensoRF bench).  Instead
the volume is stored corner-packed: row (z, y) = the full x-lines of the
four (z/z+1, y/y+1) neighbours as int8, so one 4W-byte fast-path gather
fetches every cell trilinear needs, and the interpolation folds into a
single fused multiply-reduce over the row (the weight vector carries the
z/y corner products broadcast against a two-hot x weight line).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_sample import sample_volume


def _shift1(v: np.ndarray, axis: int) -> np.ndarray:
    """v shifted one cell along ``axis`` with edge clamp."""
    idx = [slice(None)] * v.ndim
    idx[axis] = np.r_[1:v.shape[axis], v.shape[axis] - 1]
    return v[tuple(idx)]


class _PackedTrilinear:
    """Shared packed-row trilinear lookup over stacked (S, D, H, W) binary
    volumes; returns f32 in [0, 1] equal to ``ops.grid_sample.sample_volume``
    up to f32 summation order."""

    def __init__(self, vols: np.ndarray):
        s, d, h, w = vols.shape
        self.grid_size = (d, h, w)
        vy = _shift1(vols, 2)
        vz = _shift1(vols, 1)
        vzy = _shift1(vz, 2)
        # (S*D*H, 4W) int8 rows: [v(z,y,:) | v(z,y+1,:) | v(z+1,y,:) | v(z+1,y+1,:)]
        packed = np.concatenate([vols, vy, vz, vzy], axis=-1)
        self._rows = jnp.asarray(
            packed.reshape(s * d * h, 4 * w).astype(np.int8))

    def sample(self, x, y, z, sel=None) -> jnp.ndarray:
        from ..ops.vm_lookup import _axis_cells

        d, h, w = self.grid_size
        xi, wx0, wx1 = _axis_cells(x, w)
        yi, wy0, wy1 = _axis_cells(y, h)
        zi, wz0, wz1 = _axis_cells(z, d)
        base = jnp.zeros_like(xi) if sel is None else sel.astype(jnp.int32) * (d * h)
        rows = jnp.take(self._rows, base + zi * h + yi, axis=0)
        # two-hot x weight line (N, W), then the four z/y corner products
        # broadcast against it -> one fused multiply-reduce over 4W lanes
        cols = jnp.arange(w, dtype=jnp.int32)
        wx = (wx0[:, None] * (cols == xi[:, None])
              + wx1[:, None] * (cols == jnp.minimum(xi + 1, w - 1)[:, None]))
        wgt = jnp.concatenate([wz0[:, None] * wy0[:, None] * wx,
                               wz0[:, None] * wy1[:, None] * wx,
                               wz1[:, None] * wy0[:, None] * wx,
                               wz1[:, None] * wy1[:, None] * wx], axis=-1)
        return jnp.sum(rows.astype(jnp.float32) * wgt, axis=-1)


class AlphaGridMask:
    """Binary occupancy volume in normalized [-1,1]^3 coords."""

    def __init__(self, alpha_volume: np.ndarray):
        vol = np.asarray(alpha_volume, np.float32)
        self._packed = _PackedTrilinear(vol.reshape(1, *vol.shape[-3:]))
        self.grid_size = self._packed.grid_size

    @property
    def volume(self):
        """(1, D, H, W, 1) float view for checkpointing/tests."""
        d, h, w = self.grid_size
        rows = np.asarray(self._packed._rows, np.float32)
        return jnp.asarray(rows.reshape(1, d, h, 4, w)[:, :, :, 0, :]
                           .reshape(1, d, h, w, 1))

    def sample_alpha(self, norm_coords: jnp.ndarray) -> jnp.ndarray:
        """norm_coords (..., 3) in grid_sample (x, y, z) order -> (...)."""
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, 3)
        return self._packed.sample(flat[:, 0], flat[:, 1], flat[:, 2]).reshape(lead)


class YinYangAlphaGridMask:
    """Occupancy masks for both yin-yang grids, selected per sample by the
    chart flag (reference: models/EgoNeRF.py:11-24).  Stored stacked so
    the flag folds into the packed-row gather."""

    def __init__(self, alpha_volume_yin: np.ndarray, alpha_volume_yang: np.ndarray):
        yin = np.asarray(alpha_volume_yin, np.float32)
        yang = np.asarray(alpha_volume_yang, np.float32)
        assert yin.shape == yang.shape
        self._packed = _PackedTrilinear(
            np.stack([yin, yang]).reshape(2, *yin.shape[-3:]))
        self.grid_size = self._packed.grid_size

    @property
    def volume(self):
        d, h, w = self.grid_size
        rows = np.asarray(self._packed._rows, np.float32)
        return jnp.asarray(rows.reshape(2, d, h, 4, w)[:, :, :, 0, :]
                           .reshape(2, d, h, w, 1))

    def sample_alpha(self, norm_coords: jnp.ndarray) -> jnp.ndarray:
        """norm_coords (..., 4) = [r, theta, phi, flag] -> (...)."""
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, 4)
        sel = flat[:, 3].astype(jnp.int32)
        return self._packed.sample(flat[:, 0], flat[:, 1], flat[:, 2],
                                   sel).reshape(lead)


def max_pool3d_same(vol: jnp.ndarray, k: int = 3) -> jnp.ndarray:
    """(D, H, W) same-padded max pool, stride 1 (reference:
    models/tensorBase.py:372 dilates the mask before thresholding)."""
    pad = k // 2
    return jax.lax.reduce_window(
        vol, -jnp.inf, jax.lax.max, (k, k, k), (1, 1, 1),
        [(pad, pad)] * 3)


def bake_alpha_mask(alpha_grid: jnp.ndarray, threshold: float) -> np.ndarray:
    """Dense alpha (Dx, Dy, Dz) -> dilated binary volume laid out (z, y, x)
    to match grid_sample's (x, y, z) coordinate convention
    (reference: models/tensorBase.py:365-379)."""
    vol = jnp.clip(alpha_grid, 0.0, 1.0).transpose(2, 1, 0)
    vol = max_pool3d_same(vol, 3)
    return np.asarray(vol >= threshold, np.float32)

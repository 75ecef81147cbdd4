"""Alpha-mask machinery for the TensoRF baselines.

A baked binary occupancy volume sampled trilinearly to cull empty space
(reference: models/tensorBase.py:42-51, 349-413).  On TPU the mask gates
*values* (sigma forced to zero where empty) instead of gating compute —
static shapes beat ragged savings here — while ray filtering still prunes
the host-side ray buffer exactly like the reference.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.grid_sample import sample_volume


class AlphaGridMask:
    """Binary occupancy volume in normalized [-1,1]^3 coords."""

    def __init__(self, alpha_volume: np.ndarray):
        # stored (1, D, H, W, 1) float for trilinear sampling
        vol = np.asarray(alpha_volume, np.float32)
        self.volume = jnp.asarray(vol.reshape(1, *vol.shape[-3:], 1))
        self.grid_size = vol.shape[-3:]

    def sample_alpha(self, norm_coords: jnp.ndarray) -> jnp.ndarray:
        """norm_coords (..., 3) in grid_sample (x, y, z) order -> (...)."""
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, 3)
        vals = sample_volume(self.volume, flat[:, 0], flat[:, 1], flat[:, 2])
        return vals[:, 0].reshape(lead)


class YinYangAlphaGridMask:
    """Occupancy masks for both yin-yang grids, selected per sample by the
    chart flag (reference: models/EgoNeRF.py:11-24).  Stored stacked
    (2, D, H, W, 1) so the flag folds into the trilinear gather."""

    def __init__(self, alpha_volume_yin: np.ndarray, alpha_volume_yang: np.ndarray):
        yin = np.asarray(alpha_volume_yin, np.float32)
        yang = np.asarray(alpha_volume_yang, np.float32)
        assert yin.shape == yang.shape
        self.volume = jnp.asarray(
            np.stack([yin, yang]).reshape(2, *yin.shape[-3:], 1))
        self.grid_size = yin.shape[-3:]

    def sample_alpha(self, norm_coords: jnp.ndarray) -> jnp.ndarray:
        """norm_coords (..., 4) = [r, theta, phi, flag] -> (...)."""
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, 4)
        sel = flat[:, 3].astype(jnp.int32)
        vals = sample_volume(self.volume, flat[:, 0], flat[:, 1], flat[:, 2], sel)
        return vals[:, 0].reshape(lead)


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

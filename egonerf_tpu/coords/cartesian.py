"""Cartesian chart — the plain-TensoRF baseline grid.

(reference: models/coordinates.py:46-70)
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from .base import Coordinates


class CartesianCoords(Coordinates):
    name = "xyz"
    coord_dim = 3
    n_grids = 1

    def from_cartesian(self, xyz):
        return xyz

    def normalize_coord(self, coords, downsample=None):
        lo = jnp.asarray(self.aabb[0])
        inv = jnp.asarray(self.inv_grid_size)
        return (coords - lo) * inv * 2.0 - 1.0

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        self.aabb_size = self.aabb[1] - self.aabb[0]
        self.inv_grid_size = 1.0 / self.aabb_size

    def get_normalized_range(self, new_aabb):
        new_aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        lo = (new_aabb[0] - self.aabb[0]) * self.inv_grid_size
        hi = (new_aabb[1] - self.aabb[0]) * self.inv_grid_size
        return lo, hi

    def N_to_reso(self, n_voxels, aabb=None):
        aabb = self.aabb if aabb is None else np.asarray(aabb, np.float32).reshape(2, 3)
        size = aabb[1] - aabb[0]
        voxel = float(np.prod(size) / n_voxels) ** (1.0 / 3.0)
        return [int(v) for v in (size / voxel)]

"""Yin-Yang balanced spherical chart — the flagship EgoNeRF geometry.

Two identical lat-long grids rotated 90 degrees from each other cover the
sphere without pole singularities: the *yin* grid covers
theta in [pi/4, 3pi/4], phi in [-3pi/4, 3pi/4] in the normal frame, and
everything else falls to the *yang* grid whose frame swaps the polar axis
(theta_e = acos(y/r), phi_e = atan2(z, -x)).
(reference: models/coordinates.py:432-520)

TPU-native representation
-------------------------
The reference emits 7-dim coords [r,t_n,p_n, r,t_e,p_e, flag] and later
boolean-partitions points between grids with data-dependent shapes
(reference: models/EgoNeRF.py:292-297).  Both grids share the same
normalized (theta, phi) ranges, so here ``from_cartesian`` emits a compact
4-dim vector ``[r, theta_sel, phi_sel, flag]`` where (theta_sel, phi_sel)
are already the coordinates in the point's *own* grid; the field model then
gathers from yin/yang parameter stacks with the flag as a leading index —
one static-shape gather instead of two ragged ones.
"""
from __future__ import annotations

from math import pi, sqrt

import numpy as np
import jax.numpy as jnp

from .spherical import GenericSphericalCoords, _safe_acos


class YinYangSphericalCoords(GenericSphericalCoords):
    name = "yinyang"
    coord_dim = 4
    n_grids = 2

    def __init__(self, aabb, exp_r=True, N_voxel=None, r0=None, interval_th=False):
        super().__init__(aabb, exp_r=exp_r, N_voxel=N_voxel, r0=r0, interval_th=interval_th)

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        max_r = self._max_r_from_center(self.aabb)
        # both grids share these ranges (reference: models/coordinates.py:501-505)
        self.near = np.array([0.0, pi / 4.0, -3.0 * pi / 4.0], dtype=np.float32)
        self.far = np.array([max_r, 3.0 * pi / 4.0, 3.0 * pi / 4.0], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def from_cartesian(self, xyz):
        diff = xyz - jnp.asarray(self.center)
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        theta_n = _safe_acos(diff[..., 2], r)
        phi_n = jnp.arctan2(diff[..., 1], diff[..., 0])

        is_yin = (
            (pi / 4.0 <= theta_n)
            & (theta_n <= 3.0 * pi / 4.0)
            & (-3.0 * pi / 4.0 <= phi_n)
            & (phi_n <= 3.0 * pi / 4.0)
        )

        theta_e = _safe_acos(diff[..., 1], r)
        phi_e = jnp.arctan2(diff[..., 2], -diff[..., 0])

        theta = jnp.where(is_yin, theta_n, theta_e)
        phi = jnp.where(is_yin, phi_n, phi_e)
        flag = jnp.where(is_yin, 0.0, 1.0).astype(r.dtype)
        return jnp.stack([r, theta, phi, flag], axis=-1)

    def normalize_coord(self, coords, downsample=None):
        near = jnp.asarray(self.near)
        inv = jnp.asarray(self.inv_diff)
        if self.exp_r:
            norm_r = self.normalize_r(coords[..., 0] - near[0], downsample=downsample) * 2.0 - 1.0
        else:
            norm_r = (coords[..., 0] - near[0]) * inv[0] * 2.0 - 1.0
        norm_tp = (coords[..., 1:3] - near[1:3]) * inv[1:3] * 2.0 - 1.0
        return jnp.concatenate([norm_r[..., None], norm_tp, coords[..., 3:4]], axis=-1)

    def N_to_reso(self, n_voxels, aabb=None):
        # N_r : N_theta : N_phi = 1 : 2*sqrt(3)/3 : 2*sqrt(3), each grid holds
        # half the voxel budget (reference: models/coordinates.py:507-520)
        n_r = int(n_voxels ** (1.0 / 3.0) / 2.0)
        n_theta = int(n_r * 2.0 * sqrt(3.0) / 3.0)
        n_phi = n_theta * 3
        n_r += n_r % 2
        n_theta += n_theta % 2
        n_phi += n_phi % 2
        return [n_r, n_theta, n_phi]

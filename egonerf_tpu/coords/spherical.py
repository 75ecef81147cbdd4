"""Spherical coordinate family.

All charts from the reference registry that map world xyz onto a single
(r, a, b) grid (reference: models/coordinates.py:73-335, 338-429, 524-604,
607-730).  The exponential-radius math lives in :mod:`.expgrid`; here each
class only wires chart formulas and grid sizing.
"""
from __future__ import annotations

from math import pi, sqrt

import numpy as np
import jax.numpy as jnp

from .base import Coordinates
from .expgrid import (
    apply_interval_th,
    exp_ratio,
    index2r,
    make_reference_r_grid,
    normalize_r_exp,
    normalize_r_lookup,
)


def _safe_acos(num, r):
    """acos(num/r) with the reference's nan_to_num_ semantics (r=0 -> 0)."""
    ratio = jnp.where(r > 0, num / jnp.maximum(r, 1e-12), 0.0)
    return jnp.arccos(jnp.clip(ratio, -1.0, 1.0))


class SphericalCoords(Coordinates):
    """Uniform (r, theta, phi) chart (reference: models/coordinates.py:269-335)."""

    name = "sphere"

    def __init__(self, aabb):
        self.center, _ = self._center_and_max_r(aabb)
        super().__init__(aabb)

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        max_r = self._max_r_from_center(self.aabb)
        self.near = np.array([0.0, 0.0, -pi], dtype=np.float32)
        self.far = np.array([max_r, pi, pi], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def from_cartesian(self, xyz):
        diff = xyz - jnp.asarray(self.center)
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        theta = _safe_acos(diff[..., 2], r)
        phi = jnp.arctan2(diff[..., 1], diff[..., 0])
        return jnp.stack([r, theta, phi], axis=-1)

    def normalize_coord(self, coords, downsample=None):
        return (coords - jnp.asarray(self.near)) * jnp.asarray(self.inv_diff) * 2.0 - 1.0

    def get_normalized_range(self, new_aabb):
        max_r = self._max_r_from_center(new_aabb)
        norm_r_max = (max_r - self.near[0]) * self.inv_diff[0]
        return np.zeros(3, np.float32), np.array([norm_r_max, 1.0, 1.0], np.float32)

    def N_to_reso(self, n_voxels, aabb=None):
        n_r = int(n_voxels ** (1.0 / 3.0) / 2.0)
        return [n_r, n_r * 2, n_r * 4]


class GenericSphericalCoords(SphericalCoords):
    """(r, theta, phi) with optional exponential radius and interval_th
    near-field clamp (reference: models/coordinates.py:73-266)."""

    name = "generic_sphere"

    def __init__(self, aabb, exp_r=False, N_voxel=None, r0=None, interval_th=False):
        self.exp_r = bool(exp_r)
        self.interval_th = bool(interval_th)
        self.r0 = r0
        self.ratio = None
        self.ref_grid = None
        super().__init__(aabb)
        if N_voxel is not None:
            self.set_resolution(self.N_to_reso(N_voxel), r0=r0)

    @property
    def far_r(self) -> float:
        return float(self.far[0])

    def N_to_reso(self, n_voxels, aabb=None):
        n_r = int(n_voxels ** (1.0 / 3.0) / 2.0)
        n_theta = n_r * 2
        n_phi = n_theta * 2
        # force even (reference: models/coordinates.py:181-183)
        n_r += n_r % 2
        n_theta += n_theta % 2
        n_phi += n_phi % 2
        return [n_r, n_theta, n_phi]

    def set_resolution(self, resolution, r0=None):
        super().set_resolution(resolution)
        if self.exp_r:
            self.r0 = float(r0) if r0 is not None else (self.r0 if self.r0 else 0.05)
            self.ratio = exp_ratio(self.r0, self.far_r, self.resolution[0])
            if self.interval_th:
                self.ref_grid = make_reference_r_grid(self.r0, self.far_r, self.resolution[0])

    def normalize_r(self, r, downsample=None):
        if self.interval_th:
            # downsample deliberately has no effect: the lookup is expressed
            # in resolution-independent [0,1] (reference quirk at
            # models/coordinates.py:112-117)
            return normalize_r_lookup(r, self.ref_grid)
        n_r = self.resolution[0]
        ratio = self.ratio
        if downsample is not None:
            n_r = n_r // downsample
            ratio = exp_ratio(self.r0, self.far_r, n_r)
        return normalize_r_exp(r, self.r0, ratio, n_r)

    def normalize_coord(self, coords, downsample=None):
        near = jnp.asarray(self.near)
        inv = jnp.asarray(self.inv_diff)
        if not self.exp_r:
            return (coords - near) * inv * 2.0 - 1.0
        norm_r = self.normalize_r(coords[..., 0] - near[0], downsample=downsample) * 2.0 - 1.0
        norm_tp = (coords[..., 1:] - near[1:]) * inv[1:] * 2.0 - 1.0
        return jnp.concatenate([norm_r[..., None], norm_tp], axis=-1)

    def axis_positions(self, dim, new_size):
        if dim != 0 or not self.exp_r:
            return super().axis_positions(dim, new_size)
        ratio_new = exp_ratio(self.r0, self.far_r, new_size)
        grid = index2r(self.r0, ratio_new, np.arange(new_size))
        if self.interval_th:
            grid = apply_interval_th(grid, self.r0)
        return np.asarray(self.normalize_r(jnp.asarray(grid)) * 2.0 - 1.0)

    def extra_spec(self):
        return {"exp_r": self.exp_r, "interval_th": self.interval_th, "r0": self.r0}


class DirectionalSphericalCoords(SphericalCoords):
    """Folds phi<0 points onto a half-range chart by negating (r, theta)
    (reference: models/coordinates.py:338-366)."""

    name = "directional_sphere"

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        max_r = self._max_r_from_center(self.aabb)
        self.near = np.array([0.0, 0.0, 0.0], dtype=np.float32)
        self.far = np.array([max_r, pi, pi], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def normalize_coord(self, coords, downsample=None):
        r, theta, phi = coords[..., 0], coords[..., 1], coords[..., 2]
        neg = phi < 0
        r = jnp.where(neg, -r, r)
        theta = jnp.where(neg, -theta, theta)
        phi = jnp.where(neg, phi + pi, phi)
        inv = self.inv_diff
        return jnp.stack([r * inv[0], theta * inv[1], phi * inv[2] * 2.0 - 1.0], axis=-1)


class BalancedSphericalCoords(SphericalCoords):
    """Exponential radius with ratio tied to the angular resolution so cells
    stay near-cubical (reference: models/coordinates.py:369-429)."""

    name = "balanced_sphere"

    def __init__(self, aabb):
        self.ratio = None
        self.r0 = None
        self.coeff = None
        super().__init__(aabb)

    def _setup_ratio(self, n_r, n_theta):
        self.ratio = 1.0 + pi / n_theta
        self.r0 = (self.ratio - 1.0) / (self.ratio ** n_r) * float(self.far[0])
        self.coeff = (self.ratio - 1.0) / self.r0

    def N_to_reso(self, n_voxels, aabb=None):
        n_r = int(n_voxels ** (1.0 / 3.0) / 2.0)
        n_theta, n_phi = n_r * 2, n_r * 4
        self._setup_ratio(n_r, n_theta)
        return [n_r, n_theta, n_phi]

    def extra_spec(self):
        return {"ratio": self.ratio, "r0": self.r0, "coeff": self.coeff}

    def normalize_r(self, r):
        k = (jnp.log(r * self.coeff + 1.0) / np.log(self.ratio)).astype(jnp.int32)
        kf = k.astype(r.dtype)
        r_in = (self.ratio ** kf - 1.0) / self.coeff
        r_out = (self.ratio ** (kf + 1.0) - 1.0) / self.coeff
        t = (r - r_in) / (r_out - r_in)
        return (kf + t) / self.resolution[0]

    def normalize_coord(self, coords, downsample=None):
        near = jnp.asarray(self.near)
        inv = jnp.asarray(self.inv_diff)
        norm_r = self.normalize_r(coords[..., 0] - near[0]) * 2.0 - 1.0
        norm_tp = (coords[..., 1:] - near[1:]) * inv[1:] * 2.0 - 1.0
        return jnp.concatenate([norm_r[..., None], norm_tp], axis=-1)

    def axis_positions(self, dim, new_size):
        if dim != 0:
            return super().axis_positions(dim, new_size)
        grid = (self.ratio ** np.arange(new_size) - 1.0) / self.coeff
        return np.asarray(self.normalize_r(jnp.asarray(grid)) * 2.0 - 1.0)


class DirectionalBalancedSphericalCoords(BalancedSphericalCoords):
    """Balanced + directional folding (reference: models/coordinates.py:524-604)."""

    name = "directional_balanced_sphere"

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        max_r = self._max_r_from_center(self.aabb)
        self.near = np.array([0.0, 0.0, 0.0], dtype=np.float32)
        self.far = np.array([max_r, pi, pi], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def N_to_reso(self, n_voxels, aabb=None):
        n_r = int(n_voxels ** (1.0 / 3.0))
        self.ratio = 1.0 + pi / n_r
        self.r0 = (self.ratio - 1.0) / (self.ratio ** (n_r // 2)) * float(self.far[0])
        self.coeff = (self.ratio - 1.0) / self.r0
        return [n_r, n_r, n_r]

    def set_resolution(self, resolution):
        resolution = list(resolution)
        resolution[0] //= 2  # signed radius spans both half-axes (reference quirk)
        super().set_resolution(resolution)

    def normalize_coord(self, coords, downsample=None):
        r, theta, phi = coords[..., 0], coords[..., 1], coords[..., 2]
        norm_r = self.normalize_r(r - self.near[0])
        neg = phi < 0
        norm_r = jnp.where(neg, -norm_r, norm_r)
        theta = jnp.where(neg, -theta, theta)
        phi = jnp.where(neg, phi + pi, phi)
        inv = self.inv_diff
        return jnp.stack([norm_r, theta * inv[1], phi * inv[2] * 2.0 - 1.0], axis=-1)

    def axis_positions(self, dim, new_size):
        if dim != 0:
            return Coordinates.axis_positions(self, dim, new_size)
        one_dir = new_size // 2 + (new_size % 2)
        grid = (self.ratio ** np.arange(one_dir) - 1.0) / self.coeff
        pos = np.asarray(self.normalize_r(jnp.asarray(grid)))
        neg = -pos[::-1]
        if new_size % 2:
            neg = neg[:-1]
        return np.concatenate([neg, pos]).astype(np.float32)


class EulerSphericalCoords(Coordinates):
    """(r, pitch, yaw) chart (reference: models/coordinates.py:607-670)."""

    name = "euler_sphere"

    def __init__(self, aabb):
        self.center, _ = self._center_and_max_r(aabb)
        super().__init__(aabb)

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        max_r = self._max_r_from_center(self.aabb)
        self.near = np.array([0.0, -pi, -pi], dtype=np.float32)
        self.far = np.array([max_r, pi, pi], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def from_cartesian(self, xyz):
        diff = xyz - jnp.asarray(self.center)
        r = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        pitch = jnp.arctan2(diff[..., 2], diff[..., 0])
        yaw = jnp.arctan2(diff[..., 2], diff[..., 1])
        return jnp.stack([r, pitch, yaw], axis=-1)

    def normalize_coord(self, coords, downsample=None):
        return (coords - jnp.asarray(self.near)) * jnp.asarray(self.inv_diff) * 2.0 - 1.0

    def get_normalized_range(self, new_aabb):
        max_r = self._max_r_from_center(new_aabb)
        norm_r_max = (max_r - self.near[0]) * self.inv_diff[0]
        return np.zeros(3, np.float32), np.array([norm_r_max, 1.0, 1.0], np.float32)

    def N_to_reso(self, n_voxels, aabb=None):
        n_r = int(n_voxels ** (1.0 / 3.0) / 2.0)
        n_ang = int(n_r * 2 * sqrt(2))
        return [n_r, n_ang, n_ang]


class CylindricalCoords(Coordinates):
    """(rho, phi, z) chart (reference: models/coordinates.py:673-730)."""

    name = "cylinder"

    def __init__(self, aabb):
        self.center, _ = self._center_and_max_r(aabb)
        super().__init__(aabb)

    def update_aabb(self, new_aabb):
        self.aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        far_rho = float(np.max(self.aabb[1, :2] - self.center[:2]))
        self.near = np.array([0.0, -pi, self.aabb[0, 2]], dtype=np.float32)
        self.far = np.array([far_rho, pi, self.aabb[1, 2]], dtype=np.float32)
        self.inv_diff = 1.0 / (self.far - self.near)

    def from_cartesian(self, xyz):
        diff = xyz[..., :2] - jnp.asarray(self.center[:2])
        rho = jnp.sqrt(jnp.sum(diff * diff, axis=-1))
        phi = jnp.arctan2(diff[..., 1], diff[..., 0])
        return jnp.stack([rho, phi, xyz[..., 2]], axis=-1)

    def normalize_coord(self, coords, downsample=None):
        return (coords - jnp.asarray(self.near)) * jnp.asarray(self.inv_diff) * 2.0 - 1.0

    def get_normalized_range(self, new_aabb):
        new_aabb = np.asarray(new_aabb, dtype=np.float32).reshape(2, 3)
        corners = np.array(
            [[new_aabb[i, 0], new_aabb[j, 1]] for i in range(2) for j in range(2)],
            dtype=np.float32,
        )
        max_rho = float(np.max(np.linalg.norm(corners - self.center[:2], axis=-1)))
        norm_rho = (max_rho - self.near[0]) * self.inv_diff[0]
        norm_z = (new_aabb[:, 2] - self.near[2]) * self.inv_diff[2]
        lo = np.array([0.0, 0.0, norm_z[0]], np.float32)
        hi = np.array([norm_rho, 1.0, norm_z[1]], np.float32)
        return lo, hi

    def N_to_reso(self, n_voxels, aabb=None):
        return [int(n_voxels ** (1.0 / 3.0))] * 3

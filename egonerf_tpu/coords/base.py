"""Coordinate-system base class.

A ``Coordinates`` object holds *static* geometry (aabb, resolution, radial
grid constants) as host numpy values; its ``from_cartesian`` /
``normalize_coord`` methods are pure jnp functions traced into the jitted
train/render programs with those constants baked in.

API parity with the reference ``Coordinates`` ABC
(reference: models/coordinates.py:7-43) plus ``to_spec``/``from_spec`` for
checkpointing (the reference pickles the live object inside the ckpt —
reference: models/tensorBase.py:264; we store a structured spec instead).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def _linear_resample(arr: jnp.ndarray, axis: int, positions: jnp.ndarray) -> jnp.ndarray:
    """1-D linear resample of ``arr`` along ``axis`` at normalized positions
    in [-1, 1] with align_corners=True semantics (index = (p+1)/2*(n-1)),
    clamping out-of-range positions to the border."""
    n = arr.shape[axis]
    p = (positions + 1.0) * 0.5 * (n - 1)
    p = jnp.clip(p, 0.0, float(n - 1))
    lo = jnp.clip(jnp.floor(p).astype(jnp.int32), 0, n - 2) if n > 1 else jnp.zeros_like(p, jnp.int32)
    t = p - lo.astype(p.dtype)
    a = jnp.take(arr, lo, axis=axis)
    b = jnp.take(arr, jnp.minimum(lo + 1, n - 1), axis=axis)
    shape = [1] * arr.ndim
    shape[axis] = -1
    t = t.reshape(shape)
    return a * (1.0 - t) + b * t


class Coordinates:
    """Base: subclasses define the chart from world xyz to grid coords."""

    #: number of entries in a coords vector produced by from_cartesian
    coord_dim = 3
    #: number of stacked grids the field model allocates (2 for yin-yang)
    n_grids = 1
    name = "base"

    def __init__(self, aabb):
        self.aabb = np.asarray(aabb, dtype=np.float32).reshape(2, 3)
        self.resolution = None
        self.update_aabb(self.aabb)

    # -- chart ------------------------------------------------------------
    def from_cartesian(self, xyz: jnp.ndarray) -> jnp.ndarray:
        raise NotImplementedError

    def normalize_coord(self, coords: jnp.ndarray, downsample=None) -> jnp.ndarray:
        raise NotImplementedError

    # -- geometry bookkeeping ---------------------------------------------
    def update_aabb(self, new_aabb) -> None:
        raise NotImplementedError

    def get_normalized_range(self, new_aabb):
        raise NotImplementedError

    def N_to_reso(self, n_voxels: int, aabb=None):
        raise NotImplementedError

    def set_resolution(self, resolution) -> None:
        self.resolution = [int(v) for v in resolution]

    # -- parameter resampling ----------------------------------------------
    def axis_positions(self, dim: int, new_size: int) -> np.ndarray:
        """Normalized [-1,1] positions in the *current* grid at which a new
        ``new_size`` grid along coordinate ``dim`` places its nodes.  Linear
        by default; exp-r subclasses override dim 0.
        (reference: models/coordinates.py:27-39,226-266)"""
        del dim
        return np.linspace(-1.0, 1.0, new_size, dtype=np.float32)

    def up_sampling_VM(self, weights: jnp.ndarray, res_target, ids):
        """Resample a plane (S,H,W,C) with ids=[dim_h, dim_w] or a line
        (S,L,C) with ids=[dim] onto the target resolution."""
        assert len(ids) in (1, 2), "len(ids) should be 1 or 2"
        if len(ids) == 1:
            pos = jnp.asarray(self.axis_positions(ids[0], int(res_target[ids[0]])))
            return _linear_resample(weights, axis=1, positions=pos)
        pos_h = jnp.asarray(self.axis_positions(ids[0], int(res_target[ids[0]])))
        pos_w = jnp.asarray(self.axis_positions(ids[1], int(res_target[ids[1]])))
        out = _linear_resample(weights, axis=1, positions=pos_h)
        out = _linear_resample(out, axis=2, positions=pos_w)
        return out

    # -- (de)serialization ---------------------------------------------------
    def extra_spec(self) -> dict:
        return {}

    def to_spec(self) -> dict:
        spec = {
            "name": self.name,
            "aabb": np.asarray(self.aabb).tolist(),
            "resolution": list(self.resolution) if self.resolution is not None else None,
        }
        spec.update(self.extra_spec())
        return spec

    @staticmethod
    def _center_and_max_r(aabb: np.ndarray):
        aabb = np.asarray(aabb, dtype=np.float32).reshape(2, 3)
        center = aabb.sum(0) / 2.0
        # every aabb corner is equidistant from the center
        max_r = float(np.linalg.norm(aabb[1] - aabb[0]) / 2.0)
        return center, max_r

    def _max_r_from_center(self, aabb) -> float:
        """Max distance of the aabb's 8 corners from the CHART center
        (reference: models/coordinates.py:187-204).  NOT the box's own
        half-diagonal: the chart center never moves, so once shrink hands
        in an off-center box the two differ — the half-diagonal would
        crop the radial grid short of real content.  Identical to the
        half-diagonal for a box centered on the chart (the init case)."""
        aabb = np.asarray(aabb, dtype=np.float32).reshape(2, 3)
        idx = np.stack(np.meshgrid([0, 1], [0, 1], [0, 1],
                                   indexing="ij"), -1).reshape(-1, 3)
        corners = aabb[idx, np.arange(3)]  # (8, 3)
        center = np.asarray(self.center, np.float32)
        return float(np.linalg.norm(corners - center, axis=-1).max())

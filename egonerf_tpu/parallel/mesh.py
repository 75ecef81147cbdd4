"""Device mesh + sharding layout.

The reference is strictly single-GPU (SURVEY.md §2.2: no torch.distributed
anywhere).  Here multi-chip scaling is first-class and deliberately simple,
matching the model's shape:

* rays are embarrassingly parallel -> **1-D data mesh**, batch axis sharded;
* the whole field (grids + decoder + envmap, tens of MB) replicates on
  every chip;
* `jax.jit` with these shardings makes XLA insert one gradient ``psum``
  over ICI per step — no hand-written collectives needed.

A φ-sharded grid mode (splitting the largest plane axis over a second mesh
axis) is the natural extension if grids ever outgrow HBM; the helpers below
keep the mesh general enough for that.
"""
from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """First axis split across the data mesh."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, *arrays):
    """Place host arrays on the mesh with the batch axis sharded."""
    sharding = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sharding) for a in arrays)
    return out[0] if len(out) == 1 else out


def replicate_tree(mesh: Mesh, tree):
    sharding = replicated(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m

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
    """1-D data mesh over the GLOBAL device set — on a multi-host pod
    every process builds the same mesh from all devices (the per-host
    split is jax's addressable_devices bookkeeping; SURVEY §5.8: "same
    program, bigger mesh")."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def process_count() -> int:
    return jax.process_count()


def is_lead_process() -> bool:
    """True on the process that owns file IO (logs, checkpoints, images).
    Single-process runs are always the lead."""
    return jax.process_index() == 0


def put_replicated(mesh: Mesh, array):
    """Replicate a host array onto every device of the mesh — pod-safe.

    Single-process: a plain ``device_put``.  Multi-process: each process
    holds the SAME host array (datasets are loaded identically everywhere,
    seeded identically) and contributes its addressable shards via
    ``make_array_from_callback`` — a plain device_put of a cross-host
    sharding would fail on non-addressable devices.
    """
    sharding = replicated(mesh)
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    array = np.asarray(array)
    return jax.make_array_from_callback(array.shape, sharding,
                                        lambda idx: array[idx])


def put_batch_sharded(mesh: Mesh, array, spec: P):
    """Place a GLOBAL host batch with ``spec`` sharding — pod-safe.

    Multi-process: every process holds the same global array (samplers are
    seed-identical across processes) and contributes the shards it owns.
    """
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(array, sharding)
    array = np.asarray(array)
    return jax.make_array_from_callback(array.shape, sharding,
                                        lambda idx: array[idx])


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
    if jax.process_count() == 1:
        sharding = replicated(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
    # pod path: leaves may be process-local jax Arrays (seed-identical
    # across hosts); pull to host and contribute addressable shards
    return jax.tree.map(lambda x: put_replicated(mesh, jax.device_get(x)), tree)


def pad_to_multiple(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m

"""Checkpoint save/restore.

The reference pickles the live model (including the Coordinates object)
into a single ``.th`` file and auto-resumes from the newest one
(reference: models/tensorBase.py:270-295, train.py:149-160).  Here the
checkpoint is a plain ``.npz`` of the flattened parameter pytree plus a
JSON header (structured config + coordinate spec + global step) — no
pickled code objects, portable across framework versions.  Alpha-mask
volumes are bit-packed with ``np.packbits`` exactly like the reference
(reference: models/EgoNeRF.py:162-167).  The coarse sigma grid is never
stored: it is recomputed from the fine grid inside the train step.
"""
from __future__ import annotations

import glob
import json
import os
from typing import Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(params) -> dict:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = "/".join(
            str(p.key) if hasattr(p, "key") else str(p.idx) for p in path
        )
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(template, flat: dict):
    leaves_with_path = jax.tree_util.tree_flatten_with_path(template)
    treedef = jax.tree_util.tree_structure(template)
    leaves = []
    for path, _ in leaves_with_path[0]:
        key = "/".join(str(p.key) if hasattr(p, "key") else str(p.idx) for p in path)
        leaves.append(jnp.asarray(flat[key]))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, params, *, global_step: int, coords_spec: dict,
                    model_meta: dict, alpha_masks: Optional[dict] = None) -> None:
    """alpha_masks: optional {name: bool ndarray} bit-packed into the file."""
    arrays = _flatten(params)
    header = {
        "global_step": int(global_step),
        "coords_spec": coords_spec,
        "model_meta": model_meta,
        "param_keys": sorted(arrays.keys()),
    }
    if alpha_masks:
        header["alpha_masks"] = {}
        for name, vol in alpha_masks.items():
            vol = np.asarray(vol).astype(bool)
            arrays[f"__alphamask__/{name}"] = np.packbits(vol.reshape(-1))
            header["alpha_masks"][name] = list(vol.shape)
    arrays["__header__"] = np.frombuffer(json.dumps(header).encode(), dtype=np.uint8)
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **arrays)


def load_checkpoint(path: str):
    """Returns (flat_params dict, header dict, alpha_masks dict)."""
    data = np.load(path, allow_pickle=False)
    header = json.loads(bytes(data["__header__"]).decode())
    flat = {k: data[k] for k in header["param_keys"]}
    masks = {}
    for name, shape in header.get("alpha_masks", {}).items():
        packed = data[f"__alphamask__/{name}"]
        n = int(np.prod(shape))
        masks[name] = np.unpackbits(packed)[:n].reshape(shape).astype(bool)
    return flat, header, masks


def unflatten_params(template, flat: dict):
    """Rebuild the parameter pytree from a flat checkpoint dict — use with
    :func:`load_checkpoint` when the header was already needed (avoids a
    second full read of a multi-hundred-MB file)."""
    return _unflatten(template, flat)


def restore_params(template, path: str):
    flat, header, masks = load_checkpoint(path)
    return _unflatten(template, flat), header, masks


def checkpoint_step(path: str) -> int:
    """The ``global_step`` stored in a checkpoint's header; -1 when the
    file is not a readable checkpoint.  np.load on the zip archive reads
    only the header member, so this is cheap even for multi-GB files."""
    try:
        data = np.load(path, allow_pickle=False)
        return int(json.loads(bytes(data["__header__"]).decode())["global_step"])
    except Exception:
        return -1


def latest_checkpoint(logdir: str) -> Optional[str]:
    """Newest .npz checkpoint in the log folder — the reference's implicit
    auto-resume rule (reference: train.py:149-152).  Newest by stored
    ``global_step`` (mtime as tie-break), NOT by filename: the final
    ``{expname}.npz`` sorts lexically BEFORE every intermediate
    ``{expname}_NNNNNN.npz`` ('.' < '_'), so a name sort would resume a
    completed run from its last periodic snapshot and retrain the tail."""
    ckpts = glob.glob(os.path.join(logdir, "*.npz"))
    if not ckpts:
        return None
    return max(ckpts, key=lambda p: (checkpoint_step(p), os.path.getmtime(p)))

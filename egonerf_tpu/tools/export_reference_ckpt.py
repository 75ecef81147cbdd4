"""Export one of this framework's ``.npz`` checkpoints as a reference
PyTorch ``.th`` — the inverse of :mod:`import_reference_ckpt`, so models
trained here can be rendered/inspected with the upstream repo (e.g. to
cross-validate a result with the original implementation).

Builds the reference EgoNeRF from the checkpoint's stored geometry spec
and model meta, copies every tensor with the head-to-head mapping
(:func:`headtohead_reference._copy_params_to_ref`), reinstalls alpha
masks, and writes via the reference's own ``save`` (reference:
models/EgoNeRF.py:158-172) so the file is exactly what ``train.py
--evaluation 1`` expects.

Usage:
    python -m egonerf_tpu.tools.export_reference_ckpt ckpt.npz out.th \
        [--reference=/root/reference]
"""
from __future__ import annotations

import os
import sys

import numpy as np


def export(ckpt_path: str, out_path: str,
           reference: str = "/root/reference", near_far=None) -> dict:
    if not os.path.isdir(reference):
        raise SystemExit(
            f"reference checkout not found at {reference!r} — exporting "
            "instantiates the upstream model classes")
    import jax

    from ..coords import coords_from_spec
    from ..models import build_model
    from ..models.egonerf import EgoNeRF, FieldConfig
    from ..train.checkpoint import load_checkpoint, unflatten_params
    from .headtohead_reference import _copy_params_to_ref, _stub_ref_deps

    flat, header, masks = load_checkpoint(ckpt_path)
    spec, meta = header["coords_spec"], header["model_meta"]
    if spec["name"] != "yinyang":
        raise SystemExit(f"unsupported coordinates {spec['name']!r} "
                         "(EgoNeRF / yin-yang family only)")

    coords = coords_from_spec(spec)
    aabb = np.asarray(spec["aabb"], np.float32)
    cfg = FieldConfig(**{**meta,
                         "density_n_comp": tuple(meta["density_n_comp"]),
                         "app_n_comp": tuple(meta["app_n_comp"])})
    # near_far lives in the training config, not the checkpoint header —
    # pass --near_far to pin it exactly (it steers the reference's ray
    # sampling, not any exported tensor); default spans the scene sphere
    near_far = near_far or [0.05, float(coords.far[0])]
    ours = EgoNeRF(aabb, coords.resolution, coords, cfg, near_far=near_far)
    params = unflatten_params(ours.init_params(jax.random.PRNGKey(0)), flat)

    _stub_ref_deps()
    import torch

    sys.path.insert(0, reference)
    try:
        from models.coordinates import YinYangSphericalCoords as RefCoords
        from models.EgoNeRF import EgoNeRF as RefEgoNeRF
        if masks:
            from models.EgoNeRF import YinYangAlphaGridMask
    finally:
        sys.path.pop(0)

    t_aabb = torch.tensor(aabb)
    n_voxel = int(np.prod(spec["resolution"])) * 2
    ref_coords = RefCoords("cpu", t_aabb, exp_r=bool(spec.get("exp_r")),
                           N_voxel=n_voxel, r0=spec.get("r0"),
                           interval_th=bool(spec.get("interval_th")))
    # pin the EXACT stored resolution (N_to_reso rounding could differ)
    ref_coords.set_resolution(resolution=list(spec["resolution"]),
                              r0=spec.get("r0"))
    ref = RefEgoNeRF(
        t_aabb, list(spec["resolution"]), "cpu", ref_coords,
        density_n_comp=list(cfg.density_n_comp),
        appearance_n_comp=list(cfg.app_n_comp), app_dim=cfg.app_dim,
        near_far=list(near_far), shadingMode=cfg.shading_mode,
        density_shift=cfg.density_shift, distance_scale=cfg.distance_scale,
        pos_pe=cfg.pos_pe, view_pe=cfg.view_pe, fea_pe=cfg.fea_pe,
        featureC=cfg.feature_c, fea2denseAct=cfg.fea2dense_act,
        step_ratio=cfg.step_ratio,
        alphaMask_thres=cfg.alpha_mask_thres,
        rayMarch_weight_thres=cfg.ray_march_weight_thres,
        coarse_sigma_grid_update_rule="conv",
        use_envmap=cfg.use_envmap, envmap_res_H=cfg.envmap_res_h,
    )
    _copy_params_to_ref(ref, params, torch)
    if masks:
        vols = [torch.from_numpy(masks[k].astype(np.float32))
                for k in sorted(masks)]  # alpha_0 = yin, alpha_1 = yang
        ref.alphaMask = YinYangAlphaGridMask("cpu", vols[0], vols[1])
    ref.save(out_path, global_step=int(header.get("global_step", 0)))
    return {"out": out_path, "global_step": int(header.get("global_step", 0)),
            "resolution": list(spec["resolution"]),
            "use_envmap": cfg.use_envmap, "alpha_masks": bool(masks)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    reference = "/root/reference"
    near_far = None
    for a in sys.argv[1:]:
        if a.startswith("--reference="):
            reference = a.split("=", 1)[1]
        elif a.startswith("--near_far="):
            near_far = [float(v) for v in
                        a.split("=", 1)[1].strip("[]").split(",")]
    import json

    print(json.dumps(export(args[0], args[1], reference, near_far)))


if __name__ == "__main__":
    main()

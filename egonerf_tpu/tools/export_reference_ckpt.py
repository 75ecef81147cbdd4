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


#: our spec name -> reference coordinates class name (the inverse of the
#: import tool's map; reference: models/coordinates.py class table)
_REF_COORD_CLASS = {
    "xyz": "CartesianCoords",
    "sphere": "SphericalCoords",
    "balanced_sphere": "BalancedSphericalCoords",
    "directional_sphere": "DirectionalSphericalCoords",
    "directional_balanced_sphere": "DirectionalBalancedSphericalCoords",
    "euler_sphere": "EulerSphericalCoords",
    "cylinder": "CylindricalCoords",
    "generic_sphere": "GenericSphericalCoords",
}


def _export_tensorf(family, spec, cfg, params, masks, out_path, near_far,
                    reference, global_step) -> None:
    """Build the matching upstream TensoRF-family model, copy every tensor
    with the parity-test mapping (tests/test_reference_parity.py:557-764)
    and write via the reference's own save (reference:
    models/tensorBase.py:270-282)."""
    from .headtohead_reference import _stub_ref_deps

    _stub_ref_deps()
    import torch

    sys.path.insert(0, reference)
    try:
        import models.coordinates as ref_coords_mod
        from models import tensoRF as ref_tensorf
        from models.tensorBase import AlphaGridMask
    finally:
        sys.path.pop(0)

    aabb = np.asarray(spec["aabb"], np.float32)
    t_aabb = torch.tensor(aabb)
    coord_cls = getattr(ref_coords_mod, _REF_COORD_CLASS[spec["name"]])
    if spec["name"] == "generic_sphere":
        ref_coords = coord_cls(
            "cpu", t_aabb, exp_r=bool(spec.get("exp_r")),
            N_voxel=int(np.prod(spec["resolution"])), r0=spec.get("r0"),
            interval_th=bool(spec.get("interval_th")))
    else:
        ref_coords = coord_cls("cpu", t_aabb)
    reso = [int(g) for g in spec["resolution"]]
    # the fused TensorVM stores scalar n_comp; CP uses a 1-list
    # (reference: models/tensoRF.py:10-14, 292-296)
    n_den, n_app = list(cfg.density_n_comp), list(cfg.app_n_comp)
    if family == "TensorVM":
        n_den, n_app = n_den[0], n_app[0]
    elif family == "TensorCP":
        n_den, n_app = n_den[:1], n_app[:1]
    ref = getattr(ref_tensorf, family)(
        t_aabb, reso, "cpu", ref_coords,
        density_n_comp=n_den, appearance_n_comp=n_app, app_dim=cfg.app_dim,
        near_far=list(near_far), shadingMode=cfg.shading_mode,
        density_shift=cfg.density_shift, distance_scale=cfg.distance_scale,
        pos_pe=cfg.pos_pe, view_pe=cfg.view_pe, fea_pe=cfg.fea_pe,
        featureC=cfg.feature_c, fea2denseAct=cfg.fea2dense_act,
        step_ratio=cfg.step_ratio, alphaMask_thres=cfg.alpha_mask_thres,
        rayMarch_weight_thres=cfg.ray_march_weight_thres,
        use_envmap=cfg.use_envmap, envmap_res_H=cfg.envmap_res_h)
    if family in ("TensorVM", "TensorCP"):
        # vestigial upstream constructors never set the mode tables nor
        # allocate parameters (reference: models/tensoRF.py:5-14, 288-296)
        ref.matMode = [[0, 1], [0, 2], [1, 2]]
        ref.vecMode = [2, 1, 0]
        ref.init_svd_volume(reso[0], "cpu")

    def _t(a):
        return torch.tensor(np.asarray(a, np.float32))

    with torch.no_grad():
        if family == "TensorCP":
            for i in range(3):
                ref.density_line[i].copy_(
                    _t(params["density_lines"][i])[0].T[None, :, :, None])
                ref.app_line[i].copy_(
                    _t(params["app_lines"][i])[0].T[None, :, :, None])
        elif family == "TensorVM":
            for i in range(3):
                plane = torch.cat([
                    _t(params["app_planes"][i])[0].permute(2, 0, 1),
                    _t(params["density_planes"][i])[0].permute(2, 0, 1)])
                line = torch.cat([_t(params["app_lines"][i])[0].T,
                                  _t(params["density_lines"][i])[0].T])
                ref.plane_coef[i].copy_(plane)
                ref.line_coef[i].copy_(line[:, :, None])
        else:  # TensorVMSplit
            for i in range(3):
                for name in ("density", "app"):
                    getattr(ref, f"{name}_plane")[i].copy_(
                        _t(params[f"{name}_planes"][i])[0].permute(2, 0, 1)[None])
                    getattr(ref, f"{name}_line")[i].copy_(
                        _t(params[f"{name}_lines"][i])[0].T[None, :, :, None])
        ref.basis_mat.weight.copy_(_t(params["basis"]).T)
        if hasattr(ref.renderModule, "mlp"):
            for idx, key in zip((0, 2, 4), ("l1", "l2", "l3")):
                ref.renderModule.mlp[idx].weight.copy_(
                    _t(params["shader"][key]["w"]).T)
                ref.renderModule.mlp[idx].bias.copy_(
                    _t(params["shader"][key]["b"]))
        if cfg.use_envmap and "envmap" in params:
            ref.envmap.emission.copy_(_t(params["envmap"]).permute(2, 0, 1))
    if masks:
        vol = torch.from_numpy(masks["alpha_0"].astype(np.float32))
        ref.alphaMask = AlphaGridMask("cpu", vol)
    ref.save(out_path, global_step=global_step)


def export(ckpt_path: str, out_path: str,
           reference: str = "/root/reference", near_far=None,
           family: str = None) -> dict:
    if not os.path.isdir(reference):
        raise SystemExit(
            f"reference checkout not found at {reference!r} — exporting "
            "instantiates the upstream model classes")
    import jax

    from ..coords import coords_from_spec
    from ..models import build_model
    from ..models.egonerf import EgoNeRF
    from ..train.checkpoint import load_checkpoint, unflatten_params
    from .headtohead_reference import _copy_params_to_ref, _stub_ref_deps

    from ..models import _field_config

    flat, header, masks = load_checkpoint(ckpt_path)
    spec, meta = header["coords_spec"], header["model_meta"]
    cfg = _field_config(None, meta=meta)
    if spec["name"] != "yinyang":
        from ..models.tensorf import TensorCP, TensorVM, TensorVMSplit

        coords = coords_from_spec(spec)
        aabb = np.asarray(spec["aabb"], np.float32)
        cls = {"TensorVMSplit": TensorVMSplit, "TensorVM": TensorVM,
               "TensorCP": TensorCP}
        near_far = near_far or [0.05, float(np.max(np.abs(aabb)))]
        family = family or meta.get("model_name")
        if family not in cls:
            # legacy checkpoint without model_name: CP is structurally
            # unambiguous (no plane params), but VM and VMSplit share the
            # per-axis layout while their density math differs (VMSplit
            # applies a per-axis ReLU, reference tensoRF.py:210; VM is a
            # raw product) — refuse to guess between them
            if not any(k.startswith("density_planes") for k in flat):
                family = "TensorCP"
            else:
                raise SystemExit(
                    "legacy checkpoint lacks model_name and VM/VMSplit "
                    "share a parameter layout with different density math "
                    "— pass --family=TensorVMSplit or --family=TensorVM")
        model = cls[family](aabb, coords.resolution, coords, cfg,
                            near_far=near_far)
        params = unflatten_params(model.init_params(jax.random.PRNGKey(0)),
                                  flat)
        _export_tensorf(family, spec, cfg, params, masks, out_path, near_far,
                        reference, int(header.get("global_step", 0)))
        return {"out": out_path,
                "global_step": int(header.get("global_step", 0)),
                "family": family, "resolution": list(spec["resolution"]),
                "use_envmap": cfg.use_envmap, "alpha_masks": bool(masks)}

    coords = coords_from_spec(spec)
    aabb = np.asarray(spec["aabb"], np.float32)
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
    family = None
    for a in sys.argv[1:]:
        if a.startswith("--reference="):
            reference = a.split("=", 1)[1]
        elif a.startswith("--near_far="):
            near_far = [float(v) for v in
                        a.split("=", 1)[1].strip("[]").split(",")]
        elif a.startswith("--family="):
            family = a.split("=", 1)[1]
    import json

    print(json.dumps(export(args[0], args[1], reference, near_far,
                            family=family)))


if __name__ == "__main__":
    main()

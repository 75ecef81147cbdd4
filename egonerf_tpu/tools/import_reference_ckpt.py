"""Convert a reference PyTorch ``.th`` checkpoint into this framework's
``.npz`` format — models trained with the upstream repo carry over
without retraining.

The reference pickles the live model into ``{kwargs, state_dict,
global_step}`` (reference: models/tensorBase.py:270-282,
models/EgoNeRF.py:158-172), where ``kwargs`` embeds the live
``Coordinates`` object — so unpickling needs the reference package
importable.  Point ``--reference`` at a checkout (default
``/root/reference``); the tool fails with a clear error when absent.

Scope: the full model-family surface — EgoNeRF / yin-yang (the repo's
flagship), TensorVMSplit, fused-plane TensorVM and rank-1 TensorCP
(any coordinate chart), detected from the state_dict's parameter
layout.  Tensor layouts map exactly as in the numerical-parity tests
(tests/test_reference_parity.py): per-chart ``(1, C, H, W)``
ParameterLists -> stacked channel-last ``(2, H, W, C)``; lines
``(1, C, L, 1)`` -> ``(2, L, C)``; TensorVM's fused ``(3, app+den, R,
R)`` plane splits into per-axis app/density planes (app channels
first, reference: models/tensoRF.py:10-14,29-35); CP lines ``(1, C,
L, 1)`` -> ``(1, L, C)``; Linear weights transpose; envmap ``(3, 2h,
h)`` -> ``(2h, h, 3)``; bit-packed alpha masks unpack to the
framework's ``alpha_0``/``alpha_1`` (yin/yang) volumes.

Usage:
    python -m egonerf_tpu.tools.import_reference_ckpt ckpt.th out.npz \
        [--reference=/root/reference]

The output loads through the normal paths (``--ckpt out.npz`` or by
placing it in the experiment folder for auto-resume / ``--evaluation 1``).
"""
from __future__ import annotations

import os
import sys

import numpy as np


def _load_reference_ckpt(path: str, reference: str):
    if not os.path.isdir(reference):
        raise SystemExit(
            f"reference checkout not found at {reference!r} — the .th "
            "pickles the live Coordinates object, so converting needs the "
            "upstream package importable (pass --reference=/path/to/EgoNeRF)")
    import torch

    from .headtohead_reference import _stub_ref_deps

    _stub_ref_deps()
    sys.path.insert(0, reference)
    try:
        return torch.load(path, map_location="cpu", weights_only=False)
    finally:
        sys.path.pop(0)


def _np(t):
    return np.asarray(t.detach().cpu().numpy(), dtype=np.float32)


def convert(ckpt_path: str, out_path: str,
            reference: str = "/root/reference") -> dict:
    import jax

    from ..coords import coords_from_spec
    from ..models import model_meta
    from ..models.egonerf import EgoNeRF, FieldConfig
    from ..train.checkpoint import save_checkpoint

    ckpt = _load_reference_ckpt(ckpt_path, reference)
    kwargs, sd = ckpt["kwargs"], ckpt["state_dict"]

    ref_coords = kwargs["coordinates"]
    cname = type(ref_coords).__name__
    # the .th stores no model-class name (the reference's render_test gets
    # it from the CONFIG via eval(), train.py:55) — detect from the
    # state_dict's parameter layout
    if "density_plane_yin.0" in sd:
        family = "EgoNeRF"
    elif "density_plane.0" in sd and "density_line.0" in sd:
        family = "TensorVMSplit"
    elif "plane_coef" in sd and "line_coef" in sd:
        family = "TensorVM"  # fused [app, density] channel layout
    elif "density_line.0" in sd and "app_line.0" in sd:
        family = "TensorCP"
    else:
        raise SystemExit(
            "unsupported checkpoint layout: this converter covers EgoNeRF "
            "(yin-yang), TensorVMSplit, TensorVM and TensorCP — the "
            f"state_dict keys {sorted(sd)[:6]}... match none of them")
    if family == "EgoNeRF" and cname != "YinYangSphericalCoords":
        raise SystemExit(f"EgoNeRF checkpoint with coordinates {cname!r} "
                         "is not supported (yinyang only)")
    if kwargs["shadingMode"] not in ("MLP_Fea", "MLP_PE", "MLP"):
        raise SystemExit(
            f"unsupported shadingMode {kwargs['shadingMode']!r} (SH/RGB "
            "shading has no parameters to convert beyond the grids — open "
            "an issue if you need it)")

    aabb = np.asarray(kwargs["aabb"].cpu().numpy(), np.float32)
    spec = {
        "name": "yinyang" if family == "EgoNeRF" else type(ref_coords).__name__,
        "aabb": aabb.tolist(),
        "resolution": [int(g) for g in kwargs["gridSize"]],
        "exp_r": bool(getattr(ref_coords, "exp_r", False)),
        "interval_th": bool(getattr(ref_coords, "interval_th", False)),
        "r0": (float(ref_coords.r0)
               if getattr(ref_coords, "r0", None) is not None else None),
    }
    if family != "EgoNeRF":
        name_map = {"CartesianCoords": "xyz",
                    "GenericSphericalCoords": "generic_sphere",
                    "SphericalCoords": "sphere",
                    "BalancedSphericalCoords": "balanced_sphere",
                    "DirectionalSphericalCoords": "directional_sphere",
                    "DirectionalBalancedSphericalCoords":
                        "directional_balanced_sphere",
                    "EulerSphericalCoords": "euler_sphere",
                    "CylindricalCoords": "cylinder"}
        if cname not in name_map:
            raise SystemExit(f"unknown coordinates class {cname!r}")
        spec["name"] = name_map[cname]
    coords = coords_from_spec(spec)

    def _ncomp(v):
        # the fused TensorVM stores a scalar; other families store a list
        # (reference: models/tensoRF.py:10-14 vs tensorBase.py:171-173)
        vals = [int(x) for x in np.atleast_1d(v)]
        return tuple(vals * 3) if len(vals) == 1 else tuple(vals)

    cfg = FieldConfig(
        density_n_comp=_ncomp(kwargs["density_n_comp"]),
        app_n_comp=_ncomp(kwargs["appearance_n_comp"]),
        app_dim=int(kwargs["app_dim"]),
        shading_mode=kwargs["shadingMode"],
        pos_pe=int(kwargs["pos_pe"]), view_pe=int(kwargs["view_pe"]),
        fea_pe=int(kwargs["fea_pe"]), feature_c=int(kwargs["featureC"]),
        density_shift=float(kwargs["density_shift"]),
        distance_scale=float(kwargs["distance_scale"]),
        fea2dense_act=kwargs["fea2denseAct"],
        ray_march_weight_thres=float(kwargs["rayMarch_weight_thres"]),
        alpha_mask_thres=float(kwargs["alphaMask_thres"]),
        step_ratio=float(kwargs["step_ratio"]),
        use_envmap=bool(kwargs.get("use_envmap")),
        envmap_res_h=int(ckpt.get("envmap_res_H", 1000)),
    )
    near_far = [float(v) for v in kwargs["near_far"]]
    if family == "EgoNeRF":
        model = EgoNeRF(aabb, coords.resolution, coords, cfg,
                        near_far=near_far)
    else:
        from ..models.tensorf import TensorCP, TensorVM, TensorVMSplit

        cls = {"TensorVMSplit": TensorVMSplit, "TensorVM": TensorVM,
               "TensorCP": TensorCP}[family]
        model = cls(aabb, coords.resolution, coords, cfg, near_far=near_far)
    params = dict(model.init_params(jax.random.PRNGKey(0)))

    def take(key, expect_shape):
        arr = _np(sd[key])
        if tuple(arr.shape) != tuple(expect_shape):
            raise SystemExit(f"{key}: reference shape {arr.shape} != "
                             f"expected {tuple(expect_shape)}")
        return arr

    if family == "TensorCP":
        # rank-1 family has no planes (reference: models/tensoRF.py:292-305)
        params["density_lines"] = list(params["density_lines"])
        params["app_lines"] = list(params["app_lines"])
        for i in range(3):
            for name in ("density", "app"):
                _, l, c = np.asarray(params[f"{name}_lines"][i]).shape
                params[f"{name}_lines"][i] = take(
                    f"{name}_line.{i}", (1, c, l, 1))[0, :, :, 0].T[None]
    elif family == "TensorVM":
        # one fused (3, app+den, R, R) tensor, app channels first
        # (reference: models/tensoRF.py:10-14; lookups slice [:app] and
        # [-den:] at :29-35) — split into the per-axis storage this
        # framework uses (the fusion is a CUDA batching detail)
        na, nd = cfg.app_n_comp[0], cfg.density_n_comp[0]
        h = np.asarray(params["density_planes"][0]).shape[1]
        l = np.asarray(params["density_lines"][0]).shape[1]
        pc = take("plane_coef", (3, na + nd, h, h))
        lc = take("line_coef", (3, na + nd, l, 1))
        for key in ("density_planes", "density_lines", "app_planes",
                    "app_lines"):
            params[key] = list(params[key])
        for i in range(3):
            params["app_planes"][i] = pc[i, :na].transpose(1, 2, 0)[None]
            params["density_planes"][i] = pc[i, na:].transpose(1, 2, 0)[None]
            params["app_lines"][i] = lc[i, :na, :, 0].T[None]
            params["density_lines"][i] = lc[i, na:, :, 0].T[None]
    else:
        for i in range(3):
            for name in ("density", "app"):
                ours_p = np.asarray(params[f"{name}_planes"][i])  # (S,H,W,C)
                ours_l = np.asarray(params[f"{name}_lines"][i])   # (S,L,C)
                h, w, c = ours_p.shape[1:]
                l = ours_l.shape[1]
                if family == "EgoNeRF":
                    plane = np.stack([
                        take(f"{name}_plane_yin.{i}",
                             (1, c, h, w))[0].transpose(1, 2, 0),
                        take(f"{name}_plane_yang.{i}",
                             (1, c, h, w))[0].transpose(1, 2, 0)])
                    line = np.stack([
                        take(f"{name}_line_yin.{i}", (1, c, l, 1))[0, :, :, 0].T,
                        take(f"{name}_line_yang.{i}", (1, c, l, 1))[0, :, :, 0].T])
                else:
                    plane = take(f"{name}_plane.{i}",
                                 (1, c, h, w))[0].transpose(1, 2, 0)[None]
                    line = take(f"{name}_line.{i}",
                                (1, c, l, 1))[0, :, :, 0].T[None]
                params[f"{name}_planes"] = list(params[f"{name}_planes"])
                params[f"{name}_lines"] = list(params[f"{name}_lines"])
                params[f"{name}_planes"][i] = plane
                params[f"{name}_lines"][i] = line

    basis = np.asarray(params["basis"])
    if family == "EgoNeRF":
        params["basis"] = np.stack([
            take("basis_mat_yin.weight", basis.shape[1:][::-1]).T,
            take("basis_mat_yang.weight", basis.shape[1:][::-1]).T])
    else:
        params["basis"] = take("basis_mat.weight", basis.shape[::-1]).T

    shader = {k: dict(v) for k, v in params["shader"].items()}
    for idx, key in zip((0, 2, 4), ("l1", "l2", "l3")):
        w = np.asarray(shader[key]["w"])
        shader[key]["w"] = take(f"renderModule.mlp.{idx}.weight", w.shape[::-1]).T
        shader[key]["b"] = take(f"renderModule.mlp.{idx}.bias", shader[key]["b"].shape)
    params["shader"] = shader

    if cfg.use_envmap:
        em = np.asarray(ckpt["envmap.emission"], np.float32)  # (3, 2h, h)
        params["envmap"] = em.transpose(1, 2, 0)

    masks = None
    if "alphaMask_yin.shape" in ckpt:
        masks = {}
        for j, chart in enumerate(("yin", "yang")):
            shape = ckpt[f"alphaMask_{chart}.shape"]
            n = int(np.prod(shape))
            masks[f"alpha_{j}"] = (np.unpackbits(ckpt[f"alphaMask_{chart}.mask"])
                                   [:n].reshape(shape).astype(bool))
    elif "alphaMask.shape" in ckpt:  # single-grid TensoRF family
        # the reference stores the (1,1,D,H,W) grid_sample view; only the
        # last 3 dims are the volume (its loader does view(1,1,*shape[-3:]),
        # reference: models/tensorBase.py:43-47,287-291)
        shape = tuple(ckpt["alphaMask.shape"])[-3:]
        n = int(np.prod(shape))
        masks = {"alpha_0": (np.unpackbits(ckpt["alphaMask.mask"])
                             [:n].reshape(shape).astype(bool))}

    save_checkpoint(out_path, params,
                    global_step=int(ckpt.get("global_step", 0)),
                    coords_spec=coords.to_spec(),
                    model_meta=model_meta(None, model),
                    alpha_masks=masks)
    return {"out": out_path, "global_step": int(ckpt.get("global_step", 0)),
            "resolution": spec["resolution"],
            "use_envmap": cfg.use_envmap,
            "alpha_masks": bool(masks)}


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    if len(args) != 2:
        raise SystemExit(__doc__)
    reference = "/root/reference"
    for a in sys.argv[1:]:
        if a.startswith("--reference="):
            reference = a.split("=", 1)[1]
    import json

    print(json.dumps(convert(args[0], args[1], reference)))


if __name__ == "__main__":
    main()

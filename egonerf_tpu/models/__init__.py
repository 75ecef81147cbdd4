"""Model registry + construction (replaces the reference's eval()-based
class lookup, reference: train.py:55,159)."""
from __future__ import annotations

from .egonerf import EgoNeRF, FieldConfig
from .envmap import envmap_radiance, init_envmap
from .shading import make_shader


def _field_config(cfg, meta=None) -> FieldConfig:
    if meta:
        import dataclasses

        # meta may carry non-FieldConfig keys (e.g. model_name, added so
        # converters can detect the family without a training config)
        fields = {f.name for f in dataclasses.fields(FieldConfig)}
        meta = {k: v for k, v in meta.items() if k in fields}
        return FieldConfig(**{**meta, "density_n_comp": tuple(meta["density_n_comp"]),
                              "app_n_comp": tuple(meta["app_n_comp"])})
    return FieldConfig(
        density_n_comp=tuple(cfg.n_lamb_sigma),
        app_n_comp=tuple(cfg.n_lamb_sh),
        app_dim=cfg.data_dim_color,
        shading_mode=cfg.shadingMode,
        pos_pe=cfg.pos_pe,
        view_pe=cfg.view_pe,
        fea_pe=cfg.fea_pe,
        feature_c=cfg.featureC,
        density_shift=cfg.density_shift,
        distance_scale=cfg.distance_scale,
        fea2dense_act=cfg.fea2denseAct,
        ray_march_weight_thres=cfg.rm_weight_mask_thre,
        alpha_mask_thres=cfg.alpha_mask_thre,
        step_ratio=cfg.step_ratio,
        use_envmap=cfg.use_envmap,
        envmap_res_h=int(cfg.envmap_res_H / cfg.downsample_train),
        compute_dtype=cfg.compute_dtype,
    )


def build_model(cfg, aabb, grid_size, coordinates, near_far, meta=None):
    field_cfg = _field_config(cfg, meta=meta)
    # a checkpoint's stored family wins over the config default so that
    # imported reference checkpoints (any TensoRF variant) evaluate without
    # a hand-matched config (reference keeps it config-side via eval(),
    # train.py:55)
    name = (meta or {}).get("model_name") or cfg.model_name
    if (meta or {}).get("model_name") and name != cfg.model_name:
        print(f"build_model: checkpoint stores model_name={name!r}; the "
              f"config's {cfg.model_name!r} is ignored (a checkpoint's "
              f"family always wins)")
    if name == "EgoNeRF":
        return EgoNeRF(aabb, grid_size, coordinates, field_cfg, near_far=near_far)
    if name in ("TensorVMSplit", "TensorVM", "TensorCP"):
        from .tensorf import TensorCP, TensorVM, TensorVMSplit

        cls = {"TensorVMSplit": TensorVMSplit, "TensorVM": TensorVM,
               "TensorCP": TensorCP}[name]
        return cls(aabb, grid_size, coordinates, field_cfg, near_far=near_far)
    raise ValueError(f"unknown model {name}")


def model_meta(cfg, model) -> dict:
    """Structured model kwargs stored in checkpoints (replaces the
    reference's pickled get_kwargs, reference: models/tensorBase.py:241-268)."""
    import dataclasses

    meta = dataclasses.asdict(model.cfg)
    meta["density_n_comp"] = list(meta["density_n_comp"])
    meta["app_n_comp"] = list(meta["app_n_comp"])
    meta["model_name"] = type(model).__name__
    return meta

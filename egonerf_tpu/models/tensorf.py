"""TensoRF model family — the single-grid baselines.

``TensorVMSplit`` (per-axis plane+line VM decomposition, the plain-TensoRF
model used for LLFF), ``TensorVM`` (planes fused across axes) and
``TensorCP`` (rank-1 lines only).  (reference: models/tensoRF.py)

These share the EgoNeRF lookup machinery with a stack size of 1 (sel=None)
and add the subsystems the yin-yang model retired: alpha-mask culling, ray
filtering, aabb shrinking, and the generic linear/NDC ray samplers
(reference: models/tensorBase.py:297-510).
"""
from __future__ import annotations

from math import pi
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.vm_lookup import (
    LINE_HAT as _LINE_HAT,
    sample_line_hat,
    sample_line_packed,
    sample_plane_packed,
    sample_plane_packed_fastgrad,
)
from ..ops.volrend import raw2alpha
from .alphamask import AlphaGridMask, bake_alpha_mask
from .egonerf import MAT_MODE, VEC_MODE, FieldConfig, feature2density
from .envmap import envmap_radiance, init_envmap
from .shading import _HOIST_DIRS, make_shader


class TensorBase:
    """Shared machinery for the single-grid TensoRF variants."""

    name = "TensorBase"

    def __init__(self, aabb, grid_size, coordinates, cfg: FieldConfig,
                 near_far=(2.0, 6.0)):
        self.aabb = np.asarray(aabb, np.float32).reshape(2, 3)
        self.coordinates = coordinates
        self.cfg = cfg
        self.near_far = (float(near_far[0]), float(near_far[1]))
        self.shader = make_shader(cfg.shading_mode, cfg.app_dim, cfg.pos_pe,
                                  cfg.view_pe, cfg.fea_pe, cfg.feature_c)
        self.alpha_mask: Optional[AlphaGridMask] = None
        self.update_step_size(grid_size)

    # -- bookkeeping (reference: models/tensorBase.py:206-217) ----------
    def update_step_size(self, grid_size):
        self.grid_size = [int(g) for g in grid_size]
        aabb_size = self.aabb[1] - self.aabb[0]
        self.units = aabb_size / (np.asarray(self.grid_size) - 1)
        self.step_size = float(np.mean(self.units) * self.cfg.step_ratio)
        half_diag = float(np.linalg.norm(aabb_size) / 2.0)
        self.n_samples_auto = int(half_diag / self.step_size) + 1

    # -- ray samplers ---------------------------------------------------
    def sample_ray(self, rays_o, rays_d, key, n_samples: int):
        """Uniform steps from the aabb entry point
        (reference: models/tensorBase.py:308-327)."""
        near, far = self.near_far
        n_rays = rays_o.shape[0]
        vec = jnp.where(rays_d == 0, 1e-6, rays_d)
        rate_a = (jnp.asarray(self.aabb[1]) - rays_o) / vec
        rate_b = (jnp.asarray(self.aabb[0]) - rays_o) / vec
        t_min = jnp.clip(jnp.max(jnp.minimum(rate_a, rate_b), axis=-1), near, far)
        rng = jnp.broadcast_to(jnp.arange(n_samples, dtype=jnp.float32), (n_rays, n_samples))
        if key is not None:
            rng = rng + jax.random.uniform(key, (n_rays, n_samples))
        interpx = t_min[..., None] + self.step_size * rng
        pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
        in_box = jnp.all((pts >= jnp.asarray(self.aabb[0]))
                         & (pts <= jnp.asarray(self.aabb[1])), axis=-1)
        return pts, interpx, in_box

    def sample_ray_ndc(self, rays_o, rays_d, key, n_samples: int):
        """(reference: models/tensorBase.py:297-306)"""
        near, far = self.near_far
        n_rays = rays_o.shape[0]
        interpx = jnp.broadcast_to(
            jnp.linspace(near, far, n_samples), (n_rays, n_samples))
        if key is not None:
            interpx = interpx + jax.random.uniform(
                key, (n_rays, n_samples)) * ((far - near) / n_samples)
        pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
        in_box = jnp.all((pts >= jnp.asarray(self.aabb[0]))
                         & (pts <= jnp.asarray(self.aabb[1])), axis=-1)
        return pts, interpx, in_box

    def sample_ray_exp(self, rays_o, rays_d, key, n_samples: int):
        """Exponential steps with ratio 1 + pi/N
        (reference: models/tensorBase.py:329-344)."""
        near, far = self.near_far
        n_rays = rays_o.shape[0]
        ratio = 1.0 + pi / n_samples
        r0 = max((far - near) * (ratio - 1.0) / (ratio ** n_samples - 1.0), 0.002)
        rng = jnp.broadcast_to(jnp.arange(n_samples, dtype=jnp.float32), (n_rays, n_samples))
        if key is not None:
            rng = rng + jax.random.uniform(key, (n_rays, n_samples))
        steps = r0 * ratio ** rng
        csum = jnp.cumsum(steps, axis=-1)
        excl = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
        interpx = near + excl
        pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
        in_box = jnp.all((pts >= jnp.asarray(self.aabb[0]))
                         & (pts <= jnp.asarray(self.aabb[1])), axis=-1)
        return pts, interpx, in_box

    # -- field interface (variants implement) ---------------------------
    def init_params(self, key) -> dict:
        raise NotImplementedError

    def compute_field(self, params, norm_coords):
        raise NotImplementedError

    def compute_density_feature_only(self, params, norm_coords):
        raise NotImplementedError

    # -- alpha mask ------------------------------------------------------
    def compute_alpha(self, params, norm_coords, length: float) -> jnp.ndarray:
        feat = self.compute_density_feature_only(params, norm_coords)
        sigma = feature2density(feat, self.cfg)
        if self.alpha_mask is not None:
            gate = self.alpha_mask.sample_alpha(norm_coords[..., :3]) > 0
            sigma = jnp.where(gate, sigma, 0.0)
        return 1.0 - jnp.exp(-sigma * length)

    def get_dense_alpha(self, params, grid_size=None) -> jnp.ndarray:
        """Dense alpha over the normalized grid
        (reference: models/tensorBase.py:349-363)."""
        gs = self.grid_size if grid_size is None else [int(g) for g in grid_size]
        axes = [jnp.linspace(-1.0, 1.0, g) for g in gs]
        grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)
        # params is a jit ARGUMENT, not a closure capture: closing over it
        # would constant-fold the multi-million-element grids into the HLO
        # (minutes-long compile + duplicated grid memory) on every bake
        fn = jax.jit(lambda p, plane_coords: self.compute_alpha(
            p, plane_coords.reshape(-1, 3), self.step_size).reshape(gs[1], gs[2]))
        rows = [fn(params, grid[i]) for i in range(gs[0])]
        return jnp.stack(rows)

    def update_alpha_mask(self, params, grid_size=None):
        """Bake + dilate + threshold the occupancy volume
        (reference: models/tensorBase.py:365-379).  Returns the tight new
        aabb of occupied space in world coords."""
        gs = self.grid_size if grid_size is None else [int(g) for g in grid_size]
        alpha = self.get_dense_alpha(params, gs)
        vol = bake_alpha_mask(alpha, self.cfg.alpha_mask_thres)
        self.alpha_mask = AlphaGridMask(vol)
        occ = np.argwhere(np.asarray(vol).transpose(2, 1, 0) > 0)  # (x,y,z) idx
        if len(occ) == 0:
            return self.aabb
        lo = occ.min(0) / (np.asarray(gs) - 1)
        hi = occ.max(0) / (np.asarray(gs) - 1)
        new_aabb = np.stack([
            self.aabb[0] + lo * (self.aabb[1] - self.aabb[0]),
            self.aabb[0] + hi * (self.aabb[1] - self.aabb[0]),
        ])
        total = float(np.asarray(vol).sum())
        print(f"alpha rest %{total / np.prod(gs) * 100:.2f}")
        return new_aabb.astype(np.float32)

    def filtering_rays(self, params, all_rays, all_rgbs, all_depths=None,
                       n_samples=256, chunk=10240 * 5, bbox_only=False):
        """Host-side pruning of rays that never touch occupied space
        (reference: models/tensorBase.py:381-413)."""
        n = all_rays.shape[0]
        masks = []
        sampler = jax.jit(lambda r: self._filter_chunk(params, r, n_samples, bbox_only))
        for i in range(0, n, chunk):
            rays = jnp.asarray(all_rays[i : i + chunk])
            masks.append(np.asarray(sampler(rays)))
        mask = np.concatenate(masks)
        print(f"ray filtering: kept {mask.sum()}/{n}")
        out = [all_rays[mask], all_rgbs[mask]]
        if all_depths is not None:
            out.append(all_depths[mask])
        return tuple(out)

    def _filter_chunk(self, params, rays, n_samples, bbox_only):
        rays_o, rays_d = rays[:, :3], rays[:, 3:6]
        if bbox_only or self.alpha_mask is None:
            vec = jnp.where(rays_d == 0, 1e-6, rays_d)
            rate_a = (jnp.asarray(self.aabb[1]) - rays_o) / vec
            rate_b = (jnp.asarray(self.aabb[0]) - rays_o) / vec
            t_min = jnp.max(jnp.minimum(rate_a, rate_b), axis=-1)
            t_max = jnp.min(jnp.maximum(rate_a, rate_b), axis=-1)
            return t_max > t_min
        pts, _, _ = self.sample_ray(rays_o, rays_d, None, n_samples)
        norm = self.coordinates.normalize_coord(self.coordinates.from_cartesian(pts))
        alpha = self.alpha_mask.sample_alpha(norm[..., :3])
        return jnp.any(alpha > 0, axis=-1)

    # -- forward (reference: models/tensorBase.py:438-510) ---------------
    def forward(self, params, rays, key=None, is_train=False, n_coarse=-1,
                n_fine=0, exp_sampling=False, ndc_ray=False,
                pretrain_envmap=False, white_bg=True, **_):
        cfg = self.cfg
        rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
        if pretrain_envmap:
            return {"env": envmap_radiance(params["envmap"], viewdirs)}
        n_samples = n_coarse if n_coarse > 0 else self.n_samples_auto

        k = key if (is_train and key is not None) else None
        if ndc_ray:
            pts, z_vals, in_box = self.sample_ray_ndc(rays_o, viewdirs, k, n_samples)
            dists = jnp.diff(z_vals, axis=-1)
            dists = jnp.concatenate([dists, jnp.zeros_like(dists[..., :1])], axis=-1)
            norm_d = jnp.linalg.norm(viewdirs, axis=-1, keepdims=True)
            dists = dists * norm_d
            viewdirs = viewdirs / norm_d
        elif exp_sampling:
            pts, z_vals, in_box = self.sample_ray_exp(rays_o, viewdirs, k, n_samples)
            dists = jnp.diff(z_vals, axis=-1)
            dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
        else:
            pts, z_vals, in_box = self.sample_ray(rays_o, viewdirs, k, n_samples)
            dists = jnp.diff(z_vals, axis=-1)
            dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)

        norm = self.coordinates.normalize_coord(self.coordinates.from_cartesian(pts))

        valid = in_box
        if self.alpha_mask is not None:
            valid = valid & (self.alpha_mask.sample_alpha(norm[..., :3]) > 0)

        feat, app_feat = self.compute_field(params, norm)
        sigma = jnp.where(valid, feature2density(feat, cfg), 0.0)
        alpha, weight, bg_weight = raw2alpha(sigma, dists * cfg.distance_scale)

        if _HOIST_DIRS and self.shader.name == "MLP_Fea":
            # unexpanded per-ray dirs: MLP_Fea hoists their PE + first-layer
            # rows to (R, ·) and broadcast-adds (see shading._HOIST_DIRS)
            rgb = self.shader.apply(params.get("shader"), norm, viewdirs,
                                    app_feat)
        else:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], pts.shape)
            rgb = self.shader.apply(params.get("shader"), norm, dirs, app_feat)
        # zero out sub-threshold contributions exactly like the reference's
        # app_mask compute gate (reference: models/tensorBase.py:482-487)
        rgb = jnp.where((weight > cfg.ray_march_weight_thres)[..., None], rgb, 0.0)

        acc = jnp.sum(weight, axis=-1)
        rgb_map = jnp.sum(weight[..., None] * rgb, axis=-2)

        bg_map = env_map = None
        if cfg.use_envmap:
            alpha = jnp.concatenate([alpha, jnp.ones_like(alpha[..., :1])], axis=-1)
            env_map = envmap_radiance(params["envmap"], viewdirs)
            bg_map = bg_weight * env_map
            rgb_map = rgb_map + bg_map
        rgb_map = jnp.clip(rgb_map, 0.0, 1.0)

        depth = jnp.sum(weight * z_vals, axis=-1)
        depth = jax.lax.stop_gradient(depth + (1.0 - acc) * rays[..., -1])
        return {"rgb": rgb_map, "depth": depth, "bg": bg_map, "env": env_map,
                "alpha": alpha}

    # -- regularizer helpers shared by variants --------------------------
    @staticmethod
    def _vector_diffs(lines) -> jnp.ndarray:
        total = 0.0
        for l in lines:
            for s in range(l.shape[0]):
                v = l[s].T
                gram = v @ v.T
                n_comp = gram.shape[0]
                off = jnp.abs(gram) * (1.0 - jnp.eye(n_comp))
                total = total + jnp.sum(off) / (n_comp * (n_comp - 1))
        return total

    @staticmethod
    def _tv(plane) -> jnp.ndarray:
        s = plane.shape[0]
        h_tv = jnp.sum((plane[:, 1:] - plane[:, :-1]) ** 2)
        w_tv = jnp.sum((plane[:, :, 1:] - plane[:, :, :-1]) ** 2)
        count_h = (plane.shape[1] - 1) * plane.shape[2] * plane.shape[3]
        count_w = plane.shape[1] * (plane.shape[2] - 1) * plane.shape[3]
        return 2.0 * (h_tv / count_h + w_tv / count_w) / s

    def sparsity_density(self, params, key, n_points: int) -> jnp.ndarray:
        coords3 = jax.random.uniform(key, (n_points, 3), minval=-1.0, maxval=1.0)
        feat = self.compute_density_feature_only(params, coords3)
        return feature2density(feat, self.cfg)


class TensorVMSplit(TensorBase):
    """Per-axis plane+line VM decomposition (reference: models/tensoRF.py:127-284)."""

    name = "TensorVMSplit"
    # VMSplit rectifies each axis' density contribution
    # (reference: models/tensoRF.py:210 F.relu); the fused TensorVM sums
    # raw products (reference: models/tensoRF.py:33,50 — no relu)
    _density_relu = True

    def init_params(self, key) -> dict:
        cfg = self.cfg
        gs = self.grid_size
        keys = jax.random.split(key, 16)
        params = {"density_planes": [], "density_lines": [],
                  "app_planes": [], "app_lines": []}
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            params["density_planes"].append(
                0.1 * jax.random.normal(keys[i], (1, gs[m1], gs[m0], cfg.density_n_comp[i])))
            params["density_lines"].append(
                0.1 * jax.random.normal(keys[3 + i], (1, gs[VEC_MODE[i]], cfg.density_n_comp[i])))
            params["app_planes"].append(
                0.1 * jax.random.normal(keys[6 + i], (1, gs[m1], gs[m0], cfg.app_n_comp[i])))
            params["app_lines"].append(
                0.1 * jax.random.normal(keys[9 + i], (1, gs[VEC_MODE[i]], cfg.app_n_comp[i])))
        n_app = int(sum(cfg.app_n_comp))
        bound = 1.0 / np.sqrt(n_app)
        params["basis"] = jax.random.uniform(
            keys[12], (n_app, cfg.app_dim), minval=-bound, maxval=bound)
        if self.shader.init is not None:
            params["shader"] = self.shader.init(keys[13])
        if cfg.use_envmap:
            params["envmap"] = init_envmap(keys[14], cfg.envmap_res_h, "random")
        return params

    def compute_field(self, params, norm_coords):
        n_d = self.cfg.density_n_comp
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])[:, :3]
        # same bf16 fast-path selection as EgoNeRF._fused_products (the
        # lookups are the hot kernels for this family too)
        fast = self.cfg.compute_dtype == "bfloat16"
        plane_fn = sample_plane_packed_fastgrad if fast else sample_plane_packed
        line_fn = (sample_line_hat if fast and _LINE_HAT else sample_line_packed)
        dfeat = 0.0
        app_parts = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = jnp.concatenate(
                [params["density_planes"][i], params["app_planes"][i]], axis=-1)
            line = jnp.concatenate(
                [params["density_lines"][i], params["app_lines"][i]], axis=-1)
            p = plane_fn(plane, flat[:, m0], flat[:, m1], None)
            l = line_fn(line, flat[:, VEC_MODE[i]], None)
            prod = p * l
            d_i = jnp.sum(prod[:, : n_d[i]], axis=-1)
            dfeat = dfeat + (jnp.maximum(d_i, 0.0) if self._density_relu else d_i)
            app_parts.append(prod[:, n_d[i] :])
        app = jnp.concatenate(app_parts, axis=-1) @ params["basis"]
        return dfeat.reshape(lead), app.reshape(*lead, -1)

    def compute_density_feature_only(self, params, norm_coords):
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])[:, :3]
        feat = 0.0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = params["density_planes"][i]
            line = params["density_lines"][i]
            pad = max(0, 32 - plane.shape[-1])
            if pad:
                plane = jnp.pad(plane, ((0, 0), (0, 0), (0, 0), (0, pad)))
                line = jnp.pad(line, ((0, 0), (0, 0), (0, pad)))
            p = sample_plane_packed(plane, flat[:, m0], flat[:, m1], None)
            l = sample_line_packed(line, flat[:, VEC_MODE[i]], None)
            f_i = jnp.sum(p * l, axis=-1)
            feat = feat + (jnp.maximum(f_i, 0.0) if self._density_relu else f_i)
        return feat.reshape(lead)

    # -- regularizers (reference: models/tensoRF.py:168-196) -------------
    def vector_comp_diffs(self, params):
        return self._vector_diffs(params["density_lines"]) + self._vector_diffs(params["app_lines"])

    def density_l1(self, params):
        total = 0.0
        for p, l in zip(params["density_planes"], params["density_lines"]):
            total = total + jnp.mean(jnp.abs(p)) + jnp.mean(jnp.abs(l))
        return total

    def tv_loss_density(self, params):
        return sum(self._tv(p) * 1e-2 for p in params["density_planes"])

    def tv_loss_app(self, params):
        return sum(self._tv(p) * 1e-2 for p in params["app_planes"])

    # -- resolution surgery ----------------------------------------------
    def upsample_params(self, params, res_target):
        out = dict(params)
        for pk, lk in (("density_planes", "density_lines"), ("app_planes", "app_lines")):
            new_p, new_l = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                new_p.append(self.coordinates.up_sampling_VM(
                    params[pk][i], res_target, ids=[m1, m0]))
                new_l.append(self.coordinates.up_sampling_VM(
                    params[lk][i], res_target, ids=[VEC_MODE[i]]))
            out[pk], out[lk] = new_p, new_l
        return out

    def shrink(self, params, new_aabb):
        """Crop the grids to a tighter aabb after an alpha-mask update
        (reference: models/tensoRF.py:249-284)."""
        lo_n, hi_n = self.coordinates.get_normalized_range(new_aabb)
        gs = np.asarray(self.grid_size)
        t_l = np.round(np.asarray(lo_n) * gs).astype(int)
        b_r = np.minimum(np.round(np.asarray(hi_n) * gs).astype(int) + 1, gs)
        out = dict(params)
        for pk, lk in (("density_planes", "density_lines"), ("app_planes", "app_lines")):
            new_p, new_l = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                v = VEC_MODE[i]
                new_l.append(params[lk][i][:, t_l[v] : b_r[v], :])
                new_p.append(params[pk][i][:, t_l[m1] : b_r[m1], t_l[m0] : b_r[m0], :])
            out[pk], out[lk] = new_p, new_l
        new_size = (b_r - t_l).tolist()
        self.aabb = np.asarray(new_aabb, np.float32).reshape(2, 3)
        self.coordinates.update_aabb(self.aabb)
        self.update_step_size(new_size)
        return out, new_size


class TensorVM(TensorVMSplit):
    """Planes fused across axes into single (3, res, res, C) tensors
    (reference: models/tensoRF.py:5-124).  The lookups match TensorVMSplit
    with equal per-axis resolution except that density contributions are
    NOT rectified per axis (reference: models/tensoRF.py:33,50 sums the raw
    products); parameters are stored per-axis here as well (the fused
    storage is a CUDA-batching detail with no TPU benefit)."""

    name = "TensorVM"
    _density_relu = False


class TensorCP(TensorBase):
    """Rank-1 CP decomposition: three lines per field, product across axes
    (reference: models/tensoRF.py:287-413)."""

    name = "TensorCP"

    def init_params(self, key) -> dict:
        cfg = self.cfg
        gs = self.grid_size
        keys = jax.random.split(key, 10)
        params = {"density_lines": [], "app_lines": []}
        for i in range(3):
            params["density_lines"].append(
                0.2 * jax.random.normal(keys[i], (1, gs[VEC_MODE[i]], cfg.density_n_comp[0])))
            params["app_lines"].append(
                0.2 * jax.random.normal(keys[3 + i], (1, gs[VEC_MODE[i]], cfg.app_n_comp[0])))
        bound = 1.0 / np.sqrt(cfg.app_n_comp[0])
        params["basis"] = jax.random.uniform(
            keys[6], (cfg.app_n_comp[0], cfg.app_dim), minval=-bound, maxval=bound)
        if self.shader.init is not None:
            params["shader"] = self.shader.init(keys[7])
        if cfg.use_envmap:
            params["envmap"] = init_envmap(keys[8], cfg.envmap_res_h, "random")
        return params

    def _line_products(self, lines, flat, pad_to=32):
        line_fn = (sample_line_hat
                   if self.cfg.compute_dtype == "bfloat16" and _LINE_HAT
                   else sample_line_packed)
        prod = None
        for i in range(3):
            line = lines[i]
            pad = max(0, pad_to - line.shape[-1])
            if pad:
                line = jnp.pad(line, ((0, 0), (0, 0), (0, pad)))
            l = line_fn(line, flat[:, VEC_MODE[i]], None)
            prod = l if prod is None else prod * l
        return prod

    def compute_field(self, params, norm_coords):
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])[:, :3]
        nd = self.cfg.density_n_comp[0]
        dfeat = jnp.sum(self._line_products(params["density_lines"], flat)[:, :nd], axis=-1)
        na = self.cfg.app_n_comp[0]
        app = self._line_products(params["app_lines"], flat, pad_to=na)[:, :na] @ params["basis"]
        return dfeat.reshape(lead), app.reshape(*lead, -1)

    def compute_density_feature_only(self, params, norm_coords):
        lead = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])[:, :3]
        nd = self.cfg.density_n_comp[0]
        return jnp.sum(self._line_products(params["density_lines"], flat)[:, :nd],
                       axis=-1).reshape(lead)

    def vector_comp_diffs(self, params):
        return self._vector_diffs(params["density_lines"]) + self._vector_diffs(params["app_lines"])

    def density_l1(self, params):
        return sum(jnp.mean(jnp.abs(l)) for l in params["density_lines"])

    def tv_loss_density(self, params):
        total = 0.0
        for l in params["density_lines"]:
            diff = jnp.sum((l[:, 1:] - l[:, :-1]) ** 2)
            count = (l.shape[1] - 1) * l.shape[2]
            total = total + 2.0 * diff / count * 1e-3
        return total

    def tv_loss_app(self, params):
        total = 0.0
        for l in params["app_lines"]:
            diff = jnp.sum((l[:, 1:] - l[:, :-1]) ** 2)
            count = (l.shape[1] - 1) * l.shape[2]
            total = total + 2.0 * diff / count * 1e-3
        return total

    def upsample_params(self, params, res_target):
        out = dict(params)
        for lk in ("density_lines", "app_lines"):
            out[lk] = [self.coordinates.up_sampling_VM(params[lk][i], res_target,
                                                       ids=[VEC_MODE[i]])
                       for i in range(3)]
        return out

    def shrink(self, params, new_aabb):
        lo_n, hi_n = self.coordinates.get_normalized_range(new_aabb)
        gs = np.asarray(self.grid_size)
        # CP scales by units = aabb/(gs-1), i.e. (gs-1) cells — one cell
        # tighter than VMSplit's gs scaling (reference: models/tensoRF.py:
        # 369-371 vs :253-255 — a quirk difference kept for parity)
        t_l = np.round(np.asarray(lo_n) * (gs - 1)).astype(int)
        b_r = np.minimum(np.round(np.asarray(hi_n) * (gs - 1)).astype(int) + 1, gs)
        out = dict(params)
        for lk in ("density_lines", "app_lines"):
            out[lk] = [params[lk][i][:, t_l[VEC_MODE[i]] : b_r[VEC_MODE[i]], :]
                       for i in range(3)]
        new_size = (b_r - t_l).tolist()
        self.aabb = np.asarray(new_aabb, np.float32).reshape(2, 3)
        self.coordinates.update_aabb(self.aabb)
        self.update_step_size(new_size)
        return out, new_size

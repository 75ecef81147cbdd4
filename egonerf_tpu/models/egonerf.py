"""EgoNeRF: yin-yang dual-grid VM-factorized radiance field.

TPU-native redesign of the reference model (reference: models/EgoNeRF.py).
Key architectural translations:

* **Stacked grids, flag-indexed gather.**  Yin and yang parameters live in
  one array with a leading stack axis ``(2, H, W, C)``; each sample carries
  a {0,1} flag from the coordinate chart and the bilinear gather folds the
  flag into its row index.  One static-shape program replaces the
  reference's data-dependent boolean partitioning
  (reference: models/EgoNeRF.py:292-297).
* **Pure functions over a parameter pytree.**  ``init_params`` builds the
  pytree; ``forward`` is jit-compiled once and reused for train/eval.
* **Coarse density grid recomputed in-step.**  The half-resolution sigma
  grid is an average-pool of the fine grid under ``stop_gradient`` —
  exactly the reference's 'conv' update rule which runs every iteration
  anyway (reference: train.py:356-357, models/EgoNeRF.py:124-133) — so the
  training step stays stateless.
* **Exponential ray marching from a precomputed constant grid** baked into
  the compiled program (reference: models/EgoNeRF.py:56-87).
"""
from __future__ import annotations

import dataclasses
from math import pi
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from ..coords.expgrid import make_sample_r_grid
from ..coords.yinyang import YinYangSphericalCoords
from ..ops.merge import merge_sorted
from ..ops.pdf import sample_pdf
from ..ops.vm_lookup import (
    LINE_HAT as _vm_lookup_line_hat,
    sample_line_hat,
    sample_line_packed,
    sample_line_packed_fastgrad,
    sample_plane_packed,
    sample_plane_packed_fastgrad,
)
from ..ops.mm import mixed_matmul
from ..ops.volrend import raw2alpha
from .envmap import envmap_radiance, init_envmap
from .shading import _HOIST_DIRS, make_shader

MAT_MODE = ((0, 1), (0, 2), (1, 2))
VEC_MODE = (2, 1, 0)

# in-situ ablation toggles (see ops/vm_lookup.py for the protocol),
# active only under compute_dtype=bfloat16.  Measured (BENCH_QUICK
# ablation, v5e, step p50 ms / rays/s):
#   base                 157.6 / 26,376
#   + mixed_mm only      161.8 / 25,676  <- REJECTED: casting the shader
#     MLP + basis matmuls to bf16 LOSES 4 ms — the matmuls are small
#     enough that the bf16 casts break XLA's elementwise fusions for no
#     MXU win (and cost gradient-direction parity, test_reference_parity)
#   + line_hat only      151.4 / 27,490  <- ON: line lookup as ONE
#     hat-weight MXU matmul (weights folded into the matrix)
import os as _os

_MIXED_MM = _os.environ.get("EGONERF_MIXED_MM", "0") == "1"
_LINE_HAT = _vm_lookup_line_hat  # shared flag, see ops/vm_lookup.py
# sorted pdf draws + bitonic coarse/fine merge instead of full sort
# (ops/merge.py); clean 4-way grid r3 (BENCH_QUICK, v5e, idle host,
# p50 ms / rays/s):
#   sort (off)  151.7 / 27,474      merge (ON)  151.2 / 27,552
_MERGE_SORT = _os.environ.get("EGONERF_MERGE", "1") == "1"


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static model hyperparameters (reference: models/tensorBase.py:132-158)."""
    density_n_comp: Sequence[int] = (16, 16, 16)
    app_n_comp: Sequence[int] = (48, 48, 48)
    app_dim: int = 27
    shading_mode: str = "MLP_Fea"
    pos_pe: int = 6
    view_pe: int = 2
    fea_pe: int = 2
    feature_c: int = 128
    density_shift: float = -8.0
    distance_scale: float = 25.0
    fea2dense_act: str = "softplus"
    ray_march_weight_thres: float = 1e-4
    alpha_mask_thres: float = 1e-3
    step_ratio: float = 0.5
    use_envmap: bool = False
    envmap_res_h: int = 1000
    # compute dtype for the gather + gradient-scatter hot path
    # ('bfloat16'|'float32'); parameters stay float32 masters either way.
    # bf16 measured quality-neutral (test PSNR delta ~2e-4 dB) and ~20%
    # faster end-to-end; float32 is the conservative opt-out.
    compute_dtype: str = "bfloat16"


def feature2density(feat: jnp.ndarray, cfg: FieldConfig) -> jnp.ndarray:
    if cfg.fea2dense_act == "softplus":
        return jax.nn.softplus(feat + cfg.density_shift)
    if cfg.fea2dense_act == "relu":
        return jnp.maximum(feat, 0.0)
    raise ValueError(cfg.fea2dense_act)


def _avg_pool_plane(p: jnp.ndarray) -> jnp.ndarray:
    """(S, H, W, C) -> (S, H//2, W//2, C), mean 2x2 stride 2 (AvgPool2d)."""
    s, h, w, c = p.shape
    p = p[:, : (h // 2) * 2, : (w // 2) * 2, :]
    p = p.reshape(s, h // 2, 2, w // 2, 2, c)
    return p.mean(axis=(2, 4))


def _avg_pool_line(l: jnp.ndarray) -> jnp.ndarray:
    """(S, L, C) -> (S, L//2, C), mean k=2 stride 2 (AvgPool1d)."""
    s, n, c = l.shape
    l = l[:, : (n // 2) * 2, :]
    return l.reshape(s, n // 2, 2, c).mean(axis=2)


class EgoNeRF:
    """Model definition object: holds static geometry + config, exposes pure
    functions over a parameter pytree."""

    name = "EgoNeRF"

    def __init__(self, aabb, grid_size, coordinates: YinYangSphericalCoords,
                 cfg: FieldConfig, near_far=(0.01, 15.0)):
        if not isinstance(coordinates, YinYangSphericalCoords):
            raise TypeError(
                "EgoNeRF requires the yin-yang chart (its lookups are "
                "flag-indexed dual grids) — use coordinates_name=yinyang, or "
                "a TensoRF model for other charts (reference parity: "
                "models/EgoNeRF.py:522)")
        self.aabb = np.asarray(aabb, np.float32).reshape(2, 3)
        self.coordinates = coordinates
        self.cfg = cfg
        self.near_far = (float(near_far[0]), float(near_far[1]))
        self._mm = (mixed_matmul if _MIXED_MM
                    and cfg.compute_dtype == "bfloat16" else None)
        self.shader = make_shader(cfg.shading_mode, cfg.app_dim, cfg.pos_pe,
                                  cfg.view_pe, cfg.fea_pe, cfg.feature_c,
                                  matmul=self._mm)
        self.alpha_mask = None
        self._sample_grid_cache: dict = {}
        self.update_step_size(grid_size)

    # ------------------------------------------------------------------
    # geometry bookkeeping (reference: models/tensorBase.py:206-217)
    # ------------------------------------------------------------------
    def update_step_size(self, grid_size):
        self.grid_size = [int(g) for g in grid_size]
        aabb_size = self.aabb[1] - self.aabb[0]
        self.units = aabb_size / (np.asarray(self.grid_size) - 1)
        self.step_size = float(np.mean(self.units) * self.cfg.step_ratio)
        half_diag = float(np.linalg.norm(aabb_size) / 2.0)
        self.n_samples_auto = int(half_diag / self.step_size) + 1
        self._sample_grid_cache.clear()

    # ------------------------------------------------------------------
    # parameters
    # ------------------------------------------------------------------
    def _init_vm(self, key, n_comp, scale=0.1):
        """One stacked VM decomposition: 3 planes + 3 lines, yin & yang."""
        planes, lines = [], []
        gs = self.grid_size
        keys = jax.random.split(key, 6)
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            planes.append(scale * jax.random.normal(keys[2 * i], (2, gs[m1], gs[m0], n_comp[i])))
            lines.append(scale * jax.random.normal(keys[2 * i + 1], (2, gs[VEC_MODE[i]], n_comp[i])))
        return planes, lines

    def init_params(self, key) -> dict:
        cfg = self.cfg
        k_d, k_a, k_b0, k_b1, k_s, k_e = jax.random.split(key, 6)
        d_planes, d_lines = self._init_vm(k_d, cfg.density_n_comp)
        a_planes, a_lines = self._init_vm(k_a, cfg.app_n_comp)
        n_app = int(sum(cfg.app_n_comp))
        bound = 1.0 / np.sqrt(n_app)
        basis = jnp.stack([
            jax.random.uniform(k_b0, (n_app, cfg.app_dim), minval=-bound, maxval=bound),
            jax.random.uniform(k_b1, (n_app, cfg.app_dim), minval=-bound, maxval=bound),
        ])
        params = {
            "density_planes": d_planes,
            "density_lines": d_lines,
            "app_planes": a_planes,
            "app_lines": a_lines,
            "basis": basis,
        }
        if self.shader.init is not None:
            params["shader"] = self.shader.init(k_s)
        if cfg.use_envmap:
            params["envmap"] = init_envmap(k_e, cfg.envmap_res_h, "random")
        return params

    # ------------------------------------------------------------------
    # field lookups (reference: models/EgoNeRF.py:232-413)
    #
    # TPU redesign: density (16ch) and appearance (48ch) grids share every
    # lookup coordinate, so they are fused into one 64-channel table and
    # fetched with ONE corner-packed gather per plane/line (see
    # ops/vm_lookup.py for the cost model).
    # ------------------------------------------------------------------
    def _fused_products(self, params, norm_coords):
        """Per-decomposition fused plane*line products.

        Returns (prods list of (N, Cd+Ca), sel, shape) where the first Cd
        channels belong to density and the rest to appearance.
        """
        lead_shape = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])
        xyz = flat[..., :3]
        sel = flat[..., 3].astype(jnp.int32)
        fast = self.cfg.compute_dtype == "bfloat16"
        plane_fn = sample_plane_packed_fastgrad if fast else sample_plane_packed
        line_fn = ((sample_line_hat if _LINE_HAT else sample_line_packed_fastgrad)
                   if fast else sample_line_packed)
        prods = []
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            plane = jnp.concatenate(
                [params["density_planes"][i], params["app_planes"][i]], axis=-1)
            line = jnp.concatenate(
                [params["density_lines"][i], params["app_lines"][i]], axis=-1)
            p = plane_fn(plane, xyz[..., m0], xyz[..., m1], sel)
            l = line_fn(line, xyz[..., VEC_MODE[i]], sel)
            prods.append(p * l)
        return prods, sel, lead_shape

    def compute_field(self, params, norm_coords):
        """(..., 4) -> (density_feat (...,), app_feat (..., app_dim))."""
        n_d = self.cfg.density_n_comp
        prods, sel, lead = self._fused_products(params, norm_coords)
        dfeat = 0.0
        app_parts = []
        for i, pr in enumerate(prods):
            dfeat = dfeat + jnp.maximum(jnp.sum(pr[:, : n_d[i]], axis=-1), 0.0)
            app_parts.append(pr[:, n_d[i] :])
        feats = jnp.concatenate(app_parts, axis=-1)
        mm = self._mm or (lambda a, b: a @ b)
        yin = mm(feats, params["basis"][0])
        yang = mm(feats, params["basis"][1])
        app = jnp.where(sel[..., None] == 0, yin, yang)
        return dfeat.reshape(lead), app.reshape(*lead, -1)

    def compute_density_feature(self, planes, lines, norm_coords) -> jnp.ndarray:
        """(..., 4) -> (...,) raw density: sum_i relu(sum_c plane*line).
        Standalone density path (coarse pdf grid, alpha baking)."""
        lead_shape = norm_coords.shape[:-1]
        flat = norm_coords.reshape(-1, norm_coords.shape[-1])
        xyz = flat[..., :3]
        sel = flat[..., 3].astype(jnp.int32)
        feat = 0.0
        for i in range(3):
            m0, m1 = MAT_MODE[i]
            # pad channels so packed gather rows stay >=256 bytes (the
            # <128-byte gather path is ~20x slower on v5e)
            plane = planes[i]
            line = lines[i]
            pad = max(0, 32 - plane.shape[-1])
            if pad:
                plane = jnp.pad(plane, ((0, 0), (0, 0), (0, 0), (0, pad)))
                line = jnp.pad(line, ((0, 0), (0, 0), (0, pad)))
            p = sample_plane_packed(plane, xyz[..., m0], xyz[..., m1], sel)
            l = sample_line_packed(line, xyz[..., VEC_MODE[i]], sel)
            feat = feat + jnp.maximum(jnp.sum(p * l, axis=-1), 0.0)
        return feat.reshape(lead_shape)

    def compute_app_feature(self, params, norm_coords) -> jnp.ndarray:
        """(..., 4) -> (..., app_dim) — standalone appearance path."""
        _, app = self.compute_field(params, norm_coords)
        return app

    def derive_coarse(self, params):
        """Half-resolution sigma grid ('conv' rule) under stop_gradient —
        the resampling pdf is treated as a constant, matching the
        reference's detach (reference: models/EgoNeRF.py:534)."""
        planes = [jax.lax.stop_gradient(_avg_pool_plane(p)) for p in params["density_planes"]]
        lines = [jax.lax.stop_gradient(_avg_pool_line(l)) for l in params["density_lines"]]
        return planes, lines

    # ------------------------------------------------------------------
    # ray sampling (reference: models/EgoNeRF.py:56-87, models/tensorBase.py:308-344)
    # ------------------------------------------------------------------
    def _base_sample_grid(self, n_samples: int) -> np.ndarray:
        grid = self._sample_grid_cache.get(n_samples)
        if grid is None:
            near, far = self.near_far
            grid = make_sample_r_grid(self.coordinates.r0, far - near, n_samples)
            self._sample_grid_cache[n_samples] = grid
        return grid

    def sample_ray_exp(self, rays_o, rays_d, key, n_samples: int):
        """Exponentially spaced depths; jittered within each interval when
        ``key`` is given (training)."""
        near, far = self.near_far
        n_rays = rays_o.shape[0]
        if self.coordinates.interval_th:
            base = jnp.asarray(self._base_sample_grid(n_samples))
            interval = jnp.diff(base)
            interval = jnp.concatenate([interval, interval[-1:]])
            r = jnp.broadcast_to(base, (n_rays, n_samples))
            if key is not None:
                r = r + interval[None] * jax.random.uniform(key, (n_rays, n_samples))
            interpx = near + r
        else:
            ratio = 1.0 + (pi / 2.0) / n_samples
            r0 = (far - near) * (ratio - 1.0) / (ratio ** n_samples - 1.0)
            rng = jnp.broadcast_to(jnp.arange(n_samples, dtype=jnp.float32), (n_rays, n_samples))
            if key is not None:
                rng = rng + jax.random.uniform(key, (n_rays, n_samples))
            steps = r0 * ratio ** rng
            csum = jnp.cumsum(steps, axis=-1)
            excl = jnp.concatenate([jnp.zeros_like(csum[..., :1]), csum[..., :-1]], axis=-1)
            interpx = near + excl
        pts = rays_o[..., None, :] + rays_d[..., None, :] * interpx[..., None]
        return pts, interpx

    def sample_ray_linear(self, rays_o, rays_d, key, n_samples: int):
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
        return pts, interpx

    # ------------------------------------------------------------------
    # forward (reference: models/EgoNeRF.py:491-602)
    # ------------------------------------------------------------------
    def forward(self, params, rays, key=None, is_train=False, n_coarse=128,
                n_fine=128, exp_sampling=True, resampling=True,
                use_coarse_sample=True, pretrain_envmap=False, white_bg=True,
                ndc_ray=False, eval_keep=0, train_keep=0,
                train_cull_tau=0.0, eval_keep_score="coarse", **_):
        """Render a (R, 6) ray batch.

        Returns dict(rgb, depth, bg, env, alpha).  ``key`` enables jitter +
        stochastic pdf draws; pass None for deterministic eval.

        ``eval_keep``/``train_keep`` > 0 enable the opt-in empty-space
        cull (ops/cull.py) at eval/train time respectively: the coarse
        pass scores the merged samples and only the top K per ray reach
        the fine field — the static-shape analog of the reference's
        alpha-mask compaction (reference: models/tensorBase.py:464-487).
        The culled depths/dists are constants w.r.t. parameters (the
        coarse grid is derived under stop_gradient, fine_z is detached),
        so training gradients flow exactly as if the dropped samples had
        zero density.  Defaults 0 keep reference semantics bit-identical;
        ``train_keep`` is a measured deviation — see BASELINE.md for the
        production-shape quality A/B before enabling it.
        """
        if ndc_ray:
            raise NotImplementedError(
                "NDC rays are not supported by the egocentric model "
                "(reference: models/EgoNeRF.py:504)")
        cfg = self.cfg
        rays_o, viewdirs = rays[:, :3], rays[:, 3:6]
        if pretrain_envmap:
            return {"env": envmap_radiance(params["envmap"], viewdirs)}

        k_coarse = k_pdf = None
        if is_train and key is not None:
            k_coarse, k_pdf = jax.random.split(key)

        # 1) coarse depths
        if exp_sampling:
            coarse_xyz, coarse_z = self.sample_ray_exp(rays_o, viewdirs, k_coarse, n_coarse)
        else:
            coarse_xyz, coarse_z = self.sample_ray_linear(rays_o, viewdirs, k_coarse, n_coarse)
        coarse_dists = jnp.diff(coarse_z, axis=-1)
        coarse_dists = jnp.concatenate([coarse_dists, coarse_dists[..., -1:]], axis=-1)

        # 2) coarse chart + half-res normalization
        coarse_coords = self.coordinates.from_cartesian(coarse_xyz)
        coarse_norm = self.coordinates.normalize_coord(coarse_coords, downsample=2)

        if resampling:
            # 3) coarse density -> pdf over ray
            c_planes, c_lines = self.derive_coarse(params)
            c_feat = self.compute_density_feature(c_planes, c_lines, coarse_norm)
            c_sigma = feature2density(c_feat, cfg)
            _, c_weight, _ = raw2alpha(c_sigma, coarse_dists * cfg.distance_scale)

            # 4) inverse-CDF resampling, merged with the coarse depths
            z_mid = 0.5 * (coarse_z[..., 1:] + coarse_z[..., :-1])
            fine_z = sample_pdf(z_mid, c_weight[..., 1:-1], n_fine, key=k_pdf,
                                sorted_draws=_MERGE_SORT)
            fine_z = jax.lax.stop_gradient(fine_z)
            # the reference full-sorts the coarse/fine union
            # (models/EgoNeRF.py:536-539); with sorted pdf draws both
            # halves are already sorted, so an 8-stage bitonic merge
            # replaces the ~36-stage sort network (ops/merge.py)
            if use_coarse_sample:
                z_vals = (merge_sorted(coarse_z, fine_z) if _MERGE_SORT else
                          jnp.sort(jnp.concatenate([coarse_z, fine_z], axis=-1), axis=-1))
            else:
                z_vals = fine_z if _MERGE_SORT else jnp.sort(fine_z, axis=-1)

            dists = jnp.diff(z_vals, axis=-1)
            dists = jnp.concatenate([dists, dists[..., -1:]], axis=-1)
            keep = int(train_keep if is_train else eval_keep)
            if keep and keep < z_vals.shape[-1]:
                from ..ops.cull import (coarse_importance, gumbel_perturb,
                                        select_top_k, train_tiebreak)

                if not is_train and eval_keep_score == "oracle":
                    # ORACLE scorer (mechanism experiment, BASELINE.md):
                    # rank by the FULL-RESOLUTION fine-field rendering
                    # weight of every merged sample — the upper bound any
                    # coarse-pass scorer could reach.  If the keep-K cliff
                    # persists under this ordering, the 256-sample union
                    # is genuinely non-redundant; if it vanishes, the
                    # half-res coarse score was mis-ranking.  Pays a full
                    # density pass over all S samples, so it is an
                    # instrument, not a speed path.
                    xyz_all = (rays_o[:, None, :]
                               + viewdirs[:, None, :] * z_vals[..., None])
                    norm_all = self.coordinates.normalize_coord(
                        self.coordinates.from_cartesian(xyz_all))
                    feat_all = self.compute_density_feature(
                        params["density_planes"], params["density_lines"],
                        norm_all)
                    sigma_all = feature2density(feat_all, cfg)
                    _, w_all, _ = raw2alpha(sigma_all,
                                            dists * cfg.distance_scale)
                    # same one-neighbour dilation as coarse_importance so
                    # the A/B isolates the score SOURCE, not the dilation
                    score = jnp.maximum(w_all, jnp.maximum(
                        jnp.concatenate([w_all[..., 1:], w_all[..., -1:]],
                                        axis=-1),
                        jnp.concatenate([w_all[..., :1], w_all[..., :-1]],
                                        axis=-1)))
                else:
                    score = coarse_importance(z_vals, coarse_z, c_weight)
                if is_train and key is not None:
                    # randomize the kept set each step (see ops/cull.py);
                    # fold_in leaves the k_coarse/k_pdf streams — and
                    # therefore the train_keep=0 path — bit-identical
                    k_cull = jax.random.fold_in(key, 2)
                    if train_cull_tau > 0:
                        # stochastic keep ∝ score (Gumbel-top-K): no
                        # deterministically starved band
                        score = gumbel_perturb(score, k_cull,
                                               float(train_cull_tau))
                    else:
                        score = train_tiebreak(score, k_cull)
                z_vals, dists = select_top_k(z_vals, dists, score, keep)
            xyz = rays_o[:, None, :] + viewdirs[:, None, :] * z_vals[..., None]
            norm = self.coordinates.normalize_coord(self.coordinates.from_cartesian(xyz))
        else:
            z_vals, dists, norm = coarse_z, coarse_dists, coarse_norm

        # 5) fine field evaluation + shading (one fused density+app lookup)
        feat, app_feat = self.compute_field(params, norm)
        sigma = feature2density(feat, cfg)
        alpha, weight, bg_weight = raw2alpha(sigma, dists * cfg.distance_scale)
        if _HOIST_DIRS and self.shader.name == "MLP_Fea":
            # unexpanded per-ray dirs: MLP_Fea hoists their PE + first-layer
            # rows to (R, ·) and broadcast-adds (see shading._HOIST_DIRS)
            rgb = self.shader.apply(params.get("shader"), norm, viewdirs,
                                    app_feat)
        else:
            dirs = jnp.broadcast_to(viewdirs[:, None, :], norm.shape[:-1] + (3,))
            rgb = self.shader.apply(params.get("shader"), norm, dirs, app_feat)

        # 6) composite
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
        # background fill uses the z component of the view direction — a
        # reference quirk kept for output parity (reference:
        # models/EgoNeRF.py:598, flagged TODO at models/tensorBase.py:508)
        depth = jax.lax.stop_gradient(depth + (1.0 - acc) * rays[..., -1])

        return {"rgb": rgb_map, "depth": depth, "bg": bg_map, "env": env_map,
                "alpha": alpha}

    # ------------------------------------------------------------------
    # alpha-mask baking — kept for reference parity; the published configs
    # disable it via sentinel schedules and the reference marks the path
    # deprecated (reference: models/EgoNeRF.py:437-489)
    # ------------------------------------------------------------------
    def compute_alpha(self, params, norm_coords, length: float) -> jnp.ndarray:
        feat = self.compute_density_feature(
            params["density_planes"], params["density_lines"], norm_coords)
        sigma = feature2density(feat, self.cfg)
        return 1.0 - jnp.exp(-sigma * length)

    def get_dense_alpha(self, params, grid_size=None):
        """Dense alpha over BOTH yin/yang normalized grids
        (reference: models/EgoNeRF.py:438-465)."""
        gs = self.grid_size if grid_size is None else [int(g) for g in grid_size]
        axes = [jnp.linspace(-1.0, 1.0, g) for g in gs]
        grid = jnp.stack(jnp.meshgrid(*axes, indexing="ij"), axis=-1)

        # params is a jit ARGUMENT (a closure capture would constant-fold
        # the grids into the HLO — minutes-long compile per bake); the
        # chart flag is traced too, so yin and yang share one program
        def one_slab(p, slab, flag):
            coords = jnp.concatenate(
                [slab.reshape(-1, 3), jnp.full((slab.shape[0] * slab.shape[1], 1), flag)],
                axis=-1)
            return self.compute_alpha(p, coords, self.step_size).reshape(gs[1], gs[2])

        fn = jax.jit(one_slab)
        yin = jnp.stack([fn(params, grid[i], 0.0) for i in range(gs[0])])
        yang = jnp.stack([fn(params, grid[i], 1.0) for i in range(gs[0])])
        return yin, yang

    def update_alpha_mask(self, params, grid_size=None):
        """Bake + dilate + threshold both occupancy volumes
        (reference: models/EgoNeRF.py:467-489)."""
        from .alphamask import YinYangAlphaGridMask, bake_alpha_mask

        gs = self.grid_size if grid_size is None else [int(g) for g in grid_size]
        yin, yang = self.get_dense_alpha(params, gs)
        vol_yin = bake_alpha_mask(yin, self.cfg.alpha_mask_thres)
        vol_yang = bake_alpha_mask(yang, self.cfg.alpha_mask_thres)
        self.alpha_mask = YinYangAlphaGridMask(vol_yin, vol_yang)
        total = float(vol_yin.sum() + vol_yang.sum())
        print(f"alpha rest %{total / (2 * np.prod(gs)) * 100:.2f}")
        return self.aabb

    # ------------------------------------------------------------------
    # sparsity probe + grid upsampling
    # ------------------------------------------------------------------
    def sparsity_density(self, params, key, n_points: int) -> jnp.ndarray:
        """Density at uniform random normalized coords, for the DirectVoxGO
        sparsity loss (reference: train.py:267-273 — there it probes (N,3)
        cartesian coords; here the probe covers both yin/yang charts)."""
        k1, k2 = jax.random.split(key)
        coords3 = jax.random.uniform(k1, (n_points, 3), minval=-1.0, maxval=1.0)
        flag = jax.random.bernoulli(k2, 0.5, (n_points, 1)).astype(coords3.dtype)
        norm = jnp.concatenate([coords3, flag], axis=-1)
        feat = self.compute_density_feature(params["density_planes"],
                                            params["density_lines"], norm)
        return feature2density(feat, self.cfg)

    def upsample_params(self, params, res_target):
        """Resample every plane/line onto the target resolution with the
        chart's r-aware positions (reference: models/EgoNeRF.py:415-435).
        Returns a NEW pytree; call update_step_size + rebuild the optimizer
        afterwards."""
        out = dict(params)
        for pk, lk in (("density_planes", "density_lines"), ("app_planes", "app_lines")):
            new_planes, new_lines = [], []
            for i in range(3):
                m0, m1 = MAT_MODE[i]
                new_planes.append(self.coordinates.up_sampling_VM(
                    params[pk][i], res_target, ids=[m1, m0]))
                new_lines.append(self.coordinates.up_sampling_VM(
                    params[lk][i], res_target, ids=[VEC_MODE[i]]))
            out[pk], out[lk] = new_planes, new_lines
        return out

    # ------------------------------------------------------------------
    # regularizers (reference: models/EgoNeRF.py:189-230)
    # ------------------------------------------------------------------
    @staticmethod
    def _vector_diffs(lines) -> jnp.ndarray:
        total = 0.0
        for l in lines:  # (2, L, C) — both grids, matching the reference's
            for s in range(l.shape[0]):  # separate yin/yang ParameterLists
                v = l[s].T  # (C, L)
                gram = v @ v.T
                n_comp = gram.shape[0]
                off_diag = jnp.abs(gram) * (1.0 - jnp.eye(n_comp))
                total = total + jnp.sum(off_diag) / (n_comp * (n_comp - 1))
        return total

    def vector_comp_diffs(self, params) -> jnp.ndarray:
        return self._vector_diffs(params["density_lines"]) + self._vector_diffs(params["app_lines"])

    @staticmethod
    def density_l1(params) -> jnp.ndarray:
        total = 0.0
        for p, l in zip(params["density_planes"], params["density_lines"]):
            # the stack axis holds yin+yang; per-grid means summed matches
            # the reference's separate ParameterList terms
            total = total + jnp.mean(jnp.abs(p)) * 2 + jnp.mean(jnp.abs(l)) * 2
        return total

    def coarse_sigma_l1(self, params) -> jnp.ndarray:
        """L1 on the derived coarse sigma grid (reference:
        models/EgoNeRF.py:200-206 — defined but unused by the train loop)."""
        planes, lines = self.derive_coarse(params)
        total = 0.0
        for p, l in zip(planes, lines):
            total = total + jnp.mean(jnp.abs(p)) * 2 + jnp.mean(jnp.abs(l)) * 2
        return total

    @staticmethod
    def _tv(plane) -> jnp.ndarray:
        """Squared-difference total variation over (S, H, W, C) planes
        (reference: utils.py:155-171, batch dim = S here has size 2 vs the
        reference's two size-1 calls — normalization matches)."""
        s = plane.shape[0]
        h_tv = jnp.sum((plane[:, 1:, :, :] - plane[:, :-1, :, :]) ** 2)
        w_tv = jnp.sum((plane[:, :, 1:, :] - plane[:, :, :-1, :]) ** 2)
        count_h = (plane.shape[1] - 1) * plane.shape[2] * plane.shape[3]
        count_w = plane.shape[1] * (plane.shape[2] - 1) * plane.shape[3]
        return 2.0 * (h_tv / count_h + w_tv / count_w) / s

    def tv_loss_density(self, params) -> jnp.ndarray:
        # reference applies TVLoss per grid and sums; with the stacked
        # layout each call covers both grids, so scale by 2
        return sum(self._tv(p) * 2.0 * 1e-2 for p in params["density_planes"])

    def tv_loss_app(self, params) -> jnp.ndarray:
        return sum(self._tv(p) * 2.0 * 1e-2 for p in params["app_planes"])

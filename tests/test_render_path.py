"""Novel-trajectory rendering (spiral path / video export path)."""
import os

import numpy as np
import jax
import pytest

from egonerf_tpu.coords.yinyang import YinYangSphericalCoords
from egonerf_tpu.data.datasets import SyntheticEgoDataset
from egonerf_tpu.data.synthetic import make_poses
from egonerf_tpu.models.egonerf import EgoNeRF, FieldConfig
from egonerf_tpu.render.renderer import Renderer, evaluation_path

AABB = np.array([[-8.5] * 3, [8.5] * 3], np.float32)


def test_evaluation_path_writes_frames(tmp_path):
    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=16**3, r0=0.05,
                                    interval_th=True)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                      view_pe=2, fea_pe=2, feature_c=32)
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 8.5))
    params = model.init_params(jax.random.PRNGKey(0))

    ds = SyntheticEgoDataset(n_train=2, n_test=1, height=16, width=32,
                             split="test", is_stack=True)
    renderer = Renderer(model, chunk=16 * 32, n_coarse=8, n_fine=8)
    c2ws = make_poses(3)
    frames = evaluation_path(ds, model, params, c2ws, renderer,
                             save_path=str(tmp_path))
    assert len(frames) == 3
    assert frames[0].shape == (16, 32, 3)
    assert os.path.exists(tmp_path / "000.png")
    assert os.path.exists(tmp_path / "rgbd" / "002.png")


def test_renderer_tail_padding(tmp_path):
    """Ray counts that are not a multiple of the chunk render identically
    to the unpadded path."""
    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=16**3, r0=0.05,
                                    interval_th=True)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                      view_pe=2, fea_pe=2, feature_c=32)
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 8.5))
    params = model.init_params(jax.random.PRNGKey(0))

    rng = np.random.default_rng(3)
    d = rng.normal(size=(77, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = rng.uniform(-0.2, 0.2, (77, 3)).astype(np.float32)
    rays = np.concatenate([o, d], -1).astype(np.float32)

    r32 = Renderer(model, chunk=32, n_coarse=8, n_fine=8)   # 77 -> pad to 96
    r77 = Renderer(model, chunk=77, n_coarse=8, n_fine=8)   # exact
    out_pad = r32.render_rays(params, rays)
    out_exact = r77.render_rays(params, rays)
    assert out_pad["rgb"].shape == (77, 3)
    np.testing.assert_allclose(out_pad["rgb"], out_exact["rgb"], atol=1e-5)


def test_render_view_matches_render_rays():
    """Device-side ray generation must reproduce the host-ray path."""
    from egonerf_tpu.data.ray_utils import get_rays

    coords = YinYangSphericalCoords(AABB, exp_r=True, N_voxel=16**3, r0=0.05,
                                    interval_th=True)
    cfg = FieldConfig(density_n_comp=(4, 4, 4), app_n_comp=(8, 8, 8), app_dim=12,
                      view_pe=2, fea_pe=2, feature_c=32)
    model = EgoNeRF(AABB, coords.resolution, coords, cfg, near_far=(0.05, 8.5))
    params = model.init_params(jax.random.PRNGKey(0))

    ds = SyntheticEgoDataset(n_train=2, n_test=1, height=10, width=20,
                             split="test", is_stack=True)
    renderer = Renderer(model, chunk=50, n_coarse=8, n_fine=8)
    renderer.set_directions(ds.directions)

    c2w = ds.poses[0]
    out_view = renderer.render_view(params, c2w)
    rays_o, rays_d = get_rays(ds.directions, c2w)
    out_rays = renderer.render_rays(params, np.concatenate([rays_o, rays_d], -1))
    np.testing.assert_allclose(out_view["rgb"], out_rays["rgb"], atol=1e-5)
    np.testing.assert_allclose(out_view["depth"], out_rays["depth"], atol=1e-4)


def test_renderer_from_config_mapping():
    """Renderer.from_config is the one config->render-kwargs mapping:
    cfg fields map through (n_fine zeroed when resampling is off, chunk
    defaults to eval_chunk) and explicit overrides win."""
    from types import SimpleNamespace

    cfg = SimpleNamespace(n_coarse=48, n_fine=48, resampling=False,
                          exp_sampling=True, use_coarse_sample=True,
                          eval_chunk=4096, eval_keep=0)
    r = Renderer.from_config(model=None, cfg=cfg, white_bg=True)
    assert r.chunk == 4096
    assert r.render_kwargs["n_fine"] == 0  # resampling off zeroes n_fine
    assert r.render_kwargs["n_coarse"] == 48
    assert r.render_kwargs["white_bg"] is True

    cfg.resampling = True
    r2 = Renderer.from_config(None, cfg, False, chunk=512,
                              eval_keep=192, eval_keep_score="oracle")
    assert r2.chunk == 512
    assert r2.render_kwargs["n_fine"] == 48
    assert r2.render_kwargs["eval_keep"] == 192       # override wins
    assert r2.render_kwargs["eval_keep_score"] == "oracle"

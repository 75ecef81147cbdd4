"""Data layer tests: ray geometry, samplers, synthetic scene, datasets."""
import numpy as np
import pytest

from egonerf_tpu.data.ray_utils import (
    aabb_intersect,
    get_ray_directions_360,
    get_ray_directions_blender,
    get_rays,
)
from egonerf_tpu.data.samplers import SimpleSampler, ThetaImportanceSampler
from egonerf_tpu.data.synthetic import make_poses, render_views, trace_rays
from egonerf_tpu.data.datasets import SyntheticEgoDataset


def test_equirect_directions_geometry():
    h, w = 64, 128
    dirs = get_ray_directions_360(h, w)
    assert dirs.shape == (h, w, 3)
    # every direction is unit (sin/cos construction)
    np.testing.assert_allclose(np.linalg.norm(dirs, axis=-1), 1.0, atol=1e-5)
    # center pixel looks along -z (phi ~ -pi/W, theta ~ -pi/2H — small)
    center = dirs[h // 2, w // 2]
    assert center[2] < -0.99
    # top row looks up (+y)
    assert dirs[0, :, 1].min() > 0.95
    # leftmost column: phi ~ +pi -> +z hemisphere behind
    assert dirs[h // 2, 0, 2] > 0.9


def test_get_rays_rotation_and_roi():
    h, w = 32, 64
    dirs = get_ray_directions_360(h, w)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, 3] = [1.0, 2.0, 3.0]
    rays_o, rays_d = get_rays(dirs, c2w)
    assert rays_o.shape == (h * w, 3)
    np.testing.assert_allclose(rays_o[0], [1, 2, 3], atol=1e-6)
    np.testing.assert_allclose(rays_d, dirs.reshape(-1, 3), atol=1e-6)
    # roi keeps the vertical middle half
    rays_o2, rays_d2 = get_rays(dirs, c2w, roi=[0.25, 0.75, 0.0, 1.0])
    assert rays_d2.shape == (h // 2 * w, 3)
    np.testing.assert_allclose(rays_d2, dirs[h // 4 : 3 * h // 4].reshape(-1, 3), atol=1e-6)


def test_aabb_intersect():
    aabb = np.array([[-1.0, -1, -1], [1, 1, 1]], np.float32)
    o = np.array([[-2.0, 0, 0]])
    d = np.array([[1.0, 0, 0]])
    t0, t1 = aabb_intersect(o, d, aabb)
    np.testing.assert_allclose(t0[0, 0], 1.0, atol=1e-4)
    np.testing.assert_allclose(t1[0, 0], 3.0, atol=1e-4)


def test_simple_sampler_covers_everything():
    s = SimpleSampler(100, 10)
    seen = set()
    for _ in range(10):
        ids = s.nextids()
        assert len(ids) == 10
        seen.update(ids.tolist())
    assert seen == set(range(100))


def test_theta_importance_sampler_roi_raster():
    """With a roi crop (the OmniScenes turtlebot convention: the dataset's
    buffer holds int(0.9*h) rows per image) the sampler's strides must
    match the buffer raster exactly and never index past it.  The
    reference's sampler re-applies the roi to an already-cropped img_wh
    (latent double-crop, reference: sampler.py:24-26) — this pins our fix."""
    w, h, n_img = 64, 40, 3
    roi = [0.0, 0.9, 0.0, 1.0]
    crop_h = int(0.9 * h)  # = 36 rows per image in the flat buffer
    n_total = n_img * crop_h * w
    s = ThetaImportanceSampler(3.0, n_total, (w, h), batch=50000, roi=roi)
    assert (s.w, s.h, s.img_len) == (w, crop_h, n_img)
    ids = s.nextids()
    assert ids.min() >= 0 and ids.max() < n_total
    # every image (incl. the last) and every kept row is reachable
    assert set(np.unique(ids // (w * crop_h))) == set(range(n_img))
    assert (ids % (w * crop_h)).max() >= w * (crop_h - 1)
    # a buffer that cannot be a flat (img, row, col) raster is rejected
    import pytest

    with pytest.raises(ValueError):
        ThetaImportanceSampler(3.0, n_total - 1, (w, h), batch=10, roi=roi)


def test_theta_importance_sampler_prefers_equator():
    w, h = 64, 32
    s = ThetaImportanceSampler(5.0, 2 * w * h, (w, h), batch=20000,
                               roi=[0.0, 1.0, 0.0, 1.0])
    assert s.img_len == 2
    ids = s.nextids()
    assert ids.min() >= 0 and ids.max() < 2 * w * h
    rows = (ids % (w * h)) // w
    # equator band (middle third) should be oversampled vs the poles
    mid = np.sum((rows > h / 3) & (rows < 2 * h / 3))
    pole = np.sum((rows <= h / 6) | (rows >= 5 * h / 6))
    assert mid > pole


def test_device_theta_sampler_matches_host_distribution():
    """The in-step inverse-CDF draw must reproduce the host sampler's
    marginals: latitude-weighted rows, uniform images and columns
    (reference math: sampler.py:28-38)."""
    import jax

    from egonerf_tpu.data.samplers import make_device_id_sampler

    w, h, img_len, n = 64, 32, 3, 60000
    s = ThetaImportanceSampler(5.0, img_len * w * h, (w, h), batch=n,
                               roi=[0.0, 1.0, 0.0, 1.0])
    draw = make_device_id_sampler(s, n, img_len * w * h)
    ids = np.asarray(jax.jit(draw)(jax.random.PRNGKey(0)))
    assert ids.min() >= 0 and ids.max() < img_len * w * h

    host_ids = s.nextids()
    for name, got, want, bins in (
        ("row", (ids % (w * h)) // w, (host_ids % (w * h)) // w, h),
        ("img", ids // (w * h), host_ids // (w * h), img_len),
        ("col", ids % w, host_ids % w, w),
    ):
        pg = np.bincount(got, minlength=bins) / n
        pw = np.bincount(want, minlength=bins) / n
        assert np.abs(pg - pw).max() < 0.012, f"{name} marginal diverges"
    # row marginal against the exact weight table, not just the host draw
    p_row = np.bincount((ids % (w * h)) // w, minlength=h) / n
    assert np.abs(p_row - s.weight).max() < 0.008


def test_device_simple_sampler_uniform():
    import jax

    from egonerf_tpu.data.samplers import make_device_id_sampler

    s = SimpleSampler(500, 50000)
    draw = make_device_id_sampler(s, 50000, 500)
    ids = np.asarray(jax.jit(draw)(jax.random.PRNGKey(1)))
    p = np.bincount(ids, minlength=500) / 50000
    assert ids.min() >= 0 and ids.max() < 500
    assert np.abs(p - 1.0 / 500).max() < 0.002


def test_synthetic_scene_consistency():
    """Wall hits land on the wall sphere; two cameras see consistent geometry."""
    rng = np.random.default_rng(0)
    o = rng.uniform(-0.3, 0.3, (512, 3)).astype(np.float32)
    d = rng.normal(size=(512, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb, depth = trace_rays(o, d, wall_radius=8.0)
    assert rgb.shape == (512, 3) and np.isfinite(rgb).all()
    assert (rgb >= 0).all() and (rgb <= 1.001).all()
    hit = o + depth[:, None] * d
    r = np.linalg.norm(hit, axis=-1)
    # every hit is on the wall or on a (closer) object sphere
    assert np.all(r < 8.0 + 1e-3)
    assert np.any(r < 7.0)  # some rays hit the foreground spheres


def test_synthetic_dataset_interface():
    ds = SyntheticEgoDataset(n_train=4, n_test=2, height=20, width=40, split="train")
    assert ds.all_rays.shape == (4 * 20 * 40, 6)
    assert ds.all_rgbs.shape == (4 * 20 * 40, 3)
    assert ds.scene_bbox.shape == (2, 3)
    ds_test = SyntheticEgoDataset(n_train=4, n_test=2, height=20, width=40,
                                  split="test", is_stack=True)
    assert ds_test.all_rays.shape == (2, 20 * 40, 6)
    assert ds_test.all_rgbs.shape == (2, 20, 40, 3)
    # train/test splits use disjoint poses
    assert not any(np.allclose(p, q) for p in ds.poses for q in ds_test.poses)


def test_blender_pinhole_directions():
    dirs = get_ray_directions_blender(10, 20, [50.0, 50.0])
    assert dirs.shape == (10, 20, 3)
    np.testing.assert_allclose(dirs[..., 2], -1.0)
    center = dirs[5, 10]
    np.testing.assert_allclose(center[:2], [0.5 / 50.0, -0.5 / 50.0], atol=1e-6)

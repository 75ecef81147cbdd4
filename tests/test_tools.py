"""Offline tools: sweep runner grid/locking, COLMAP converter."""
import json
import os

import numpy as np

from egonerf_tpu.tools.colmap2nerf import (
    colmap_to_transforms,
    qvec2rotmat,
    read_cameras_text,
    read_images_text,
)
from egonerf_tpu.tools.sweep import expname_for, make_param_grid, run_sweep, try_lock


def test_param_grid_and_names():
    grid = make_param_grid({"lr_init": [0.01, 0.02], "n_coarse": [64, 128]})
    assert len(grid) == 4
    names = {expname_for(c) for c in grid}
    assert len(names) == 4
    assert "lr_init-0.01_n_coarse-64" in names


def test_folder_lock(tmp_path):
    assert try_lock(str(tmp_path), "exp_a")
    assert not try_lock(str(tmp_path), "exp_a")  # second claimant loses


def test_sweep_dry_run_takes_no_locks(tmp_path, capsys):
    grid = {"lr_init": ["0.01", "0.02"]}
    launched = run_sweep("cfg.txt", grid, basedir=str(tmp_path), dry=True)
    assert len(launched) == 2
    # the preview must NOT claim locks: a dry run that mkdir'd every
    # logdir would make the later real sweep skip every experiment
    launched2 = run_sweep("cfg.txt", grid, basedir=str(tmp_path), dry=True)
    assert len(launched2) == 2
    # but an already-claimed experiment is reported as locked
    os.makedirs(os.path.join(str(tmp_path), "lr_init-0.01"))
    launched3 = run_sweep("cfg.txt", grid, basedir=str(tmp_path), dry=True)
    assert launched3 == ["lr_init-0.02"]


def test_qvec2rotmat_identity_and_orthonormal():
    np.testing.assert_allclose(qvec2rotmat([1, 0, 0, 0]), np.eye(3), atol=1e-12)
    q = np.array([0.9, 0.1, -0.3, 0.2])
    q /= np.linalg.norm(q)
    r = qvec2rotmat(q)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-10)


def test_colmap_to_transforms(tmp_path):
    (tmp_path / "cameras.txt").write_text(
        "# header\n1 PINHOLE 200 100 120.0 120.0 100.0 50.0\n")
    lines = ["# header"]
    for i in range(3):
        lines.append(f"{i+1} 1 0 0 0 {0.1*i} 0.2 {0.3*i} 1 img_{i}.png")
        lines.append("1.0 2.0 -1")
    (tmp_path / "images.txt").write_text("\n".join(lines))
    out_path = str(tmp_path / "transforms.json")
    out = colmap_to_transforms(str(tmp_path), out_path)
    assert len(out["frames"]) == 3
    assert out["w"] == 200 and out["fl_x"] == 120.0
    data = json.load(open(out_path))
    m = np.asarray(data["frames"][0]["transform_matrix"])
    assert m.shape == (4, 4)
    np.testing.assert_allclose(m[3], [0, 0, 0, 1], atol=1e-12)

    cams = read_cameras_text(str(tmp_path / "cameras.txt"))
    assert cams[1]["model"] == "PINHOLE"
    imgs = read_images_text(str(tmp_path / "images.txt"))
    assert [im["name"] for im in imgs] == [f"img_{i}.png" for i in range(3)]


def test_experiment_tools_import_and_configs_build():
    """The TPU experiment drivers (sampler A/B, envmap e2e, microbench,
    head-to-head) must import and build valid configs without a device."""
    from egonerf_tpu.tools import envmap_e2e, microbench_lookup, sampler_ab

    cfg = sampler_ab.make_config("t", "theta_importance", True)
    assert cfg.sampling_method == "theta_importance" and cfg.device_sampling
    assert cfg.N_voxel_init == 27_000_000
    assert len(sampler_ab.VARIANTS) == 3
    assert envmap_e2e.PRETRAIN > 0
    assert microbench_lookup.PLANE_SHAPES and microbench_lookup.LINE_SHAPES

    from egonerf_tpu.tools import f32_ab, profile_step, quality_run

    assert callable(f32_ab.main) and callable(profile_step.summarize)
    assert callable(quality_run.main)
    import pytest as _pytest

    with _pytest.raises(SystemExit):
        quality_run._run("nope")

    # preset -> (cfg, ds) mapping, pinned without training
    cfg, ds = quality_run.preset_spec("refscale30k_cluttered")
    assert cfg.n_iters == 30_000 and cfg.expname == "refscale30k_cluttered"
    assert ds["background"] == "cluttered" and ds["width"] == 2000
    cfg, ds = quality_run.preset_spec("refscale100k")
    assert cfg.n_iters == 100_000 and cfg.i_weights == 10_000
    assert "background" not in ds
    cfg, ds = quality_run.preset_spec("refscale10k_env")
    assert cfg.n_iters == 10_000 and cfg.use_envmap
    assert cfg.iter_pretrain_envmap == 1500 and cfg.envmap_res_H == 500
    assert cfg.near_far == [0.01, 15.0]
    assert ds["background"] == "env" and ds["width"] == 2000
    cfg, ds = quality_run.preset_spec("refscale30k_env")
    assert cfg.n_iters == 30_000 and cfg.use_envmap
    assert cfg.iter_pretrain_envmap == 1500 and cfg.envmap_res_H == 500
    assert ds["background"] == "env"
    assert cfg.vis_list == [10_000, 20_000, 30_000]


def test_synthetic_env_background_mode():
    """'env' background: rays missing all spheres get direction-only color
    and the depth-0 no-supervision sentinel."""
    import numpy as np

    from egonerf_tpu.data.synthetic import _wall_color, make_poses, render_views

    poses = make_poses(2)
    rays, rgbs, depths = render_views(poses, 20, 40, background="env")
    assert (depths == 0).any() and (depths > 0).any()
    miss = depths[0] == 0
    want = _wall_color(rays[0, miss, 3:6])
    np.testing.assert_allclose(rgbs[0, miss], want, atol=1e-6)
    # wall mode is unchanged: every ray terminates at finite depth
    _, _, d_wall = render_views(poses, 20, 40, background="wall")
    assert (d_wall > 0).all() and np.isfinite(d_wall).all()


def test_eval_bench_runs_from_checkpoint(tmp_path):
    """tools/eval_bench: restore a real checkpoint, sweep eval_keep, report
    timing + PSNR-vs-full rows (the TPU ablation driver, CPU-smoke here)."""
    from egonerf_tpu.data.datasets import SyntheticEgoDataset
    from egonerf_tpu.tools import eval_bench
    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    cfg = load_config(overrides=dict(
        expname="eb", basedir=str(tmp_path), model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0=0.05, resampling=True, use_coarse_sample=True,
        dataset_name="synthetic", n_iters=20, batch_size=256,
        n_coarse=16, n_fine=16, N_voxel_init=27_000, N_voxel_final=27_000,
        n_lamb_sigma=[4, 4, 4], n_lamb_sh=[8, 8, 8],
        near_far=[0.05, 8.5], sparsity_lambda=0.0,
        N_vis=0, vis_list=[10**9], i_weights=10**9, steps_per_call=2,
        progress_refresh_rate=10, eval_chunk=2048))
    trainer = Trainer(cfg)
    ds = dict(near_far=cfg.near_far, n_train=2, n_test=1, height=40, width=80)
    trainer.set_datasets(SyntheticEgoDataset(split="train", is_stack=False, **ds),
                         SyntheticEgoDataset(split="test", is_stack=True, **ds))
    trainer.train()

    rec = eval_bench._run(str(tmp_path / "eb"), keeps=[0, 16], n_repeats=1,
                          n_train=2, n_test=1, height=40, width=80)
    rows = {r["eval_keep"]: r for r in rec["rows"]}
    assert rows[0]["psnr_vs_full"] is None and rows[0]["psnr_vs_gt"] > 0
    assert rows[16]["psnr_vs_full"] is not None
    assert rows[16]["sec_per_image"] > 0


def test_synthetic_cluttered_background_mode():
    """'cluttered' scene: occupied space distributed through the volume
    (the cull-adversarial regime for ops/cull.py's top-K keep) — many more
    sub-wall surface hits than the wall scene, still fully analytic."""
    import numpy as np

    from egonerf_tpu.data.synthetic import make_poses, render_views

    poses = make_poses(2)
    _, _, d_wall = render_views(poses, 30, 60, background="wall")
    rays, rgbs, d_cl = render_views(poses, 30, 60, background="cluttered")
    assert (d_cl > 0).all() and np.isfinite(d_cl).all()
    near_wall = (d_wall < 7.0).mean()
    near_cl = (d_cl < 7.0).mean()
    assert near_cl > 3 * near_wall, (near_wall, near_cl)
    # deterministic scene (fixed sphere layout)
    _, rgbs2, d2 = render_views(poses, 30, 60, background="cluttered")
    np.testing.assert_array_equal(rgbs, rgbs2)
    np.testing.assert_array_equal(d_cl, d2)
    # plumbed through the dataset + the A/B driver's dataset kwargs
    from egonerf_tpu.data.datasets import SyntheticEgoDataset

    ds = SyntheticEgoDataset(split="train", is_stack=False, n_train=2,
                             n_test=1, height=20, width=40,
                             background="cluttered")
    assert ds.all_rays.shape[0] == 2 * 800


def test_cull_ab_run_variant_smoke(monkeypatch, tmp_path):
    """The exact driver path the TPU queue runs (sampler_ab.run_variant via
    cull_ab: fresh-logdir guard, cluttered scene kwarg, train_keep plumb,
    metrics.jsonl curve extraction) at CPU-tiny shape."""
    from egonerf_tpu.tools import sampler_ab

    monkeypatch.setattr(sampler_ab, "N_ITERS", 8)
    monkeypatch.setattr(sampler_ab, "VIS_EVERY", 4)
    monkeypatch.setattr(sampler_ab, "N_TRAIN", 2)
    monkeypatch.setattr(sampler_ab, "N_TEST", 1)
    monkeypatch.setattr(sampler_ab, "IMG_H", 40)
    monkeypatch.setattr(sampler_ab, "IMG_W", 80)

    tiny = dict(N_voxel_init=27_000, N_voxel_final=27_000,
                n_lamb_sigma=[4, 4, 4], n_lamb_sh=[8, 8, 8],
                n_coarse=16, n_fine=16, batch_size=256, steps_per_call=2,
                eval_chunk=2048, basedir=str(tmp_path))
    rec = sampler_ab.run_variant("tk24_cluttered", "simple", True,
                                 scene="cluttered", train_keep=24, **tiny)
    assert rec["scene"] == "cluttered"
    assert rec["psnr_by_iter"], rec  # the A/B curve the analysis reads
    assert all(v > 0 for v in rec["psnr_by_iter"].values())
    # the fresh-run guard: a second invocation must retrain, not resume
    rec2 = sampler_ab.run_variant("tk24_cluttered", "simple", True,
                                  scene="cluttered", train_keep=24, **tiny)
    assert rec2["psnr_by_iter"] == rec["psnr_by_iter"]  # same seed, fresh run


def test_tpu_chip_lock(monkeypatch, tmp_path):
    """acquire_tpu_lock serializes chip users: a held flock makes a second
    claimant time out (False); a released one is acquirable (True); the
    guard is a no-op off-axon."""
    import fcntl
    import egonerf_tpu.tools as tools

    # off-axon: no-op True, no fd taken
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    monkeypatch.setattr(tools, "_TPU_LOCK_FD", None)
    assert tools.acquire_tpu_lock() is True
    assert tools._TPU_LOCK_FD is None

    # on-axon with the lock held elsewhere: bounded wait, then False.
    # A private lock path — the real /tmp lock may be legitimately held
    # by a live experiment queue while the suite runs.
    lock_path = str(tmp_path / "chip.lock")
    monkeypatch.setenv("TPU_LOCK_PATH", lock_path)
    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    holder = os.open(lock_path, os.O_CREAT | os.O_RDWR, 0o666)
    try:
        fcntl.flock(holder, fcntl.LOCK_EX | fcntl.LOCK_NB)
        assert tools.acquire_tpu_lock(wait_s=0.1) is False
        assert tools._TPU_LOCK_FD is None
    finally:
        os.close(holder)  # releases the flock

    # lock free again: acquired and cached for the process lifetime
    assert tools.acquire_tpu_lock(wait_s=0.1) is True
    assert tools._TPU_LOCK_FD is not None
    os.close(tools._TPU_LOCK_FD)
    monkeypatch.setattr(tools, "_TPU_LOCK_FD", None)


def test_colmap_camera_models_and_distortion(tmp_path):
    """Every reference-covered COLMAP camera model maps to the right
    intrinsics + distortion block (reference: dataLoader/colmap2nerf.py:
    160-215); OPENCV_FISHEYE (k1-k4) is covered additionally."""
    from egonerf_tpu.tools.colmap2nerf import camera_intrinsics

    cases = {
        "SIMPLE_PINHOLE": ([100.0, 90.0, 45.0],
                           dict(fl_x=100.0, fl_y=100.0, cx=90.0, cy=45.0)),
        "PINHOLE": ([100.0, 110.0, 90.0, 45.0],
                    dict(fl_x=100.0, fl_y=110.0, cx=90.0, cy=45.0)),
        "SIMPLE_RADIAL": ([100.0, 90.0, 45.0, 0.01],
                          dict(fl_x=100.0, k1=0.01)),
        "RADIAL": ([100.0, 90.0, 45.0, 0.01, -0.02],
                   dict(k1=0.01, k2=-0.02)),
        "OPENCV": ([100.0, 110.0, 90.0, 45.0, 0.1, -0.2, 0.001, 0.002],
                   dict(fl_y=110.0, k1=0.1, k2=-0.2, p1=0.001, p2=0.002)),
        "OPENCV_FISHEYE": ([100.0, 110.0, 90.0, 45.0, 0.1, -0.2, 0.03, -0.04],
                           dict(k1=0.1, k2=-0.2, k3=0.03, k4=-0.04,
                                is_fisheye=True)),
        "OPENCV_SPHERICAL": ([], dict(fl_x=1.0, fl_y=1.0, is_spherical=True)),
    }
    for model, (params, want) in cases.items():
        got = camera_intrinsics({"model": model, "w": 180, "h": 90,
                                 "params": params})
        for k, v in want.items():
            assert got[k] == v, (model, k, got)
        np.testing.assert_allclose(
            got["camera_angle_x"], 2 * np.arctan(180 / (2 * got["fl_x"])))


def test_colmap_pose_normalization_invariants(tmp_path):
    """The pose chain must land reference-normalized (reference:
    dataLoader/colmap2nerf.py:268-311): mean up-vector on +z, pose
    centroid near the center of attention, avg camera distance scaled
    to 4."""
    from egonerf_tpu.tools.colmap2nerf import colmap_to_transforms

    (tmp_path / "cameras.txt").write_text(
        "1 OPENCV 200 100 120.0 120.0 100.0 50.0 0.1 -0.05 0.001 0.002\n")
    rng = np.random.default_rng(3)
    lines = []
    for i in range(6):
        q = rng.normal(size=4)
        q /= np.linalg.norm(q)
        t = rng.normal(size=3) * 2 + np.array([1.0, -2.0, 3.0])
        lines.append(f"{i+1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 im_{i}.png")
        lines.append("")
    (tmp_path / "images.txt").write_text("\n".join(lines))
    out = colmap_to_transforms(str(tmp_path), str(tmp_path / "t.json"))
    assert out["k1"] == 0.1 and out["p2"] == 0.002
    ms = [np.asarray(f["transform_matrix"]) for f in out["frames"]]
    up = sum(m[0:3, 1] for m in ms)
    up /= np.linalg.norm(up)
    np.testing.assert_allclose(up, [0, 0, 1], atol=1e-6)
    avglen = np.mean([np.linalg.norm(m[0:3, 3]) for m in ms])
    np.testing.assert_allclose(avglen, 4.0, atol=1e-6)
    # --no_center keeps raw (convention-flipped) poses
    out2 = colmap_to_transforms(str(tmp_path), str(tmp_path / "t2.json"),
                                center=False)
    m2 = np.asarray(out2["frames"][0]["transform_matrix"])
    assert not np.allclose(m2, ms[0])


def test_colmap_sharpness_and_selection(tmp_path):
    """Per-frame sharpness rides along and --keep_sharpest keeps the N
    sharpest frames (reference: dataLoader/colmap2nerf.py:96-105,253)."""
    import imageio.v2 as imageio

    from egonerf_tpu.tools.colmap2nerf import colmap_to_transforms, sharpness

    imgdir = tmp_path / "imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    sharp = (rng.uniform(size=(32, 32, 3)) * 255).astype(np.uint8)
    blurry = np.full((32, 32, 3), 128, np.uint8)
    imageio.imwrite(str(imgdir / "a.png"), sharp)
    imageio.imwrite(str(imgdir / "b.png"), blurry)
    assert sharpness(str(imgdir / "a.png")) > sharpness(str(imgdir / "b.png"))

    (tmp_path / "cameras.txt").write_text(
        "1 PINHOLE 32 32 30.0 30.0 16.0 16.0\n")
    lines = []
    for i, name in enumerate(("a.png", "b.png")):
        lines.append(f"{i+1} 1 0 0 0 {float(i)} 0 0 1 {name}")
        lines.append("")
    (tmp_path / "images.txt").write_text("\n".join(lines))
    out = colmap_to_transforms(str(tmp_path), str(tmp_path / "t.json"),
                               image_dir=str(imgdir), keep_sharpest=1,
                               center=False)
    assert len(out["frames"]) == 1
    assert out["frames"][0]["file_path"].endswith("a.png")
    assert out["frames"][0]["sharpness"] > 0
    # skip_early drops the first N images
    out3 = colmap_to_transforms(str(tmp_path), str(tmp_path / "t3.json"),
                                skip_early=1, center=False)
    assert [f["file_path"] for f in out3["frames"]] == ["b.png"]


def test_refscale_drift_parses_resets_and_events():
    """parse_segments recovers per-step time from amortized rays/s lines,
    re-anchoring at the per-vis counter reset (detected as an implied-wall
    drop) and surviving the artifact line printed with a freshly-reset
    counter; drift_blocks excludes event segments from the mean."""
    from egonerf_tpu.tools.refscale_drift import drift_blocks, parse_segments

    batch = 4096

    def line(it, raysps):
        return f"iter {it:06d} psnr 50.00 test 0.00 mse 0.0 rays/s {raysps:,.0f}\n"

    # window 1: exact 100 ms/step from a cold start with 10 s of compile
    text = ""
    for it in range(500, 3001, 500):
        text += line(it, it * batch / (10.0 + it * 0.1))
    # vis at 3000: counter resets; the next progress line is the artifact
    # (tiny counter -> absurd rays/s), then window 2 at exact 120 ms/step
    text += line(3500, 50)
    for it in range(4000, 6001, 500):
        text += line(it, (it - 3500) * batch / ((it - 3500) * 0.12))
    segs = parse_segments(text, batch)
    by_mid = dict(segs)
    assert abs(by_mid[1750] - 100.0) < 0.1
    assert abs(by_mid[5250] - 120.0) < 0.1
    # no segment spans the reset with a bogus value (the artifact line
    # re-anchors the window; anything kept must be a real rate)
    assert all(50.0 <= ms <= 500.0 for _, ms in segs), segs

    blocks = drift_blocks(segs, block=3000)
    assert blocks[0]["median_ms_per_step"] == 100.0
    # an event segment (one 10x spike) is excluded from the mean
    blocks2 = drift_blocks(segs + [(2600, 1000.0)], block=3000)
    assert blocks2[0]["n_event_segments"] == 1
    assert abs(blocks2[0]["mean_ms_per_step"] - 100.0) < 1.0


def test_rotmat_between_antiparallel_guard():
    """ADVICE r4: anti-parallel inputs (upside-down rig) must produce an
    exact 180-degree rotation, not the Rodrigues blow-up upstream emits
    (reference vendored colmap2nerf.py:125-131 lacks the guard)."""
    from egonerf_tpu.tools.colmap2nerf import rotmat_between

    a = np.array([0.0, 0.0, 1.0])
    r = rotmat_between(a, -a)
    np.testing.assert_allclose(r @ a, -a, atol=1e-12)
    np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(r), 1.0)
    # nearly anti-parallel also stays finite and correct
    b = np.array([1e-10, 0.0, -1.0])
    r2 = rotmat_between(a, b / np.linalg.norm(b))
    assert np.all(np.isfinite(r2))
    np.testing.assert_allclose(r2 @ a, b / np.linalg.norm(b), atol=1e-4)


def test_normalize_poses_degenerate_capture_raises():
    """ADVICE r4: all origins at the attention center (avglen=0) must fail
    loudly instead of silently emitting NaN poses like upstream."""
    import pytest

    from egonerf_tpu.tools.colmap2nerf import normalize_poses

    m = np.eye(4)
    frames = [{"transform_matrix": m.copy()}, {"transform_matrix": m.copy()}]
    with pytest.raises(ValueError, match="avglen"):
        normalize_poses(frames, is_spherical=True)


def test_results_path_rejects_non_slug_names():
    """Guard against the round-5 incident: an HLO op string reached
    write_results as the artifact name and produced an unparseable
    docs/ filename — results_path now fails loudly on anything that
    is not a short slug."""
    import pytest

    from egonerf_tpu.tools import results_path

    assert results_path("profile_eval_families").endswith(
        "results_profile_eval_families.json")
    for bad in ('%custom-call.50 = f32[2,258,75,16]{1,3}', 'a/b', 'a b',
                'x' * 81, ''):
        with pytest.raises(ValueError):
            results_path(bad)


def test_envmap_probe_functions():
    """Factorization probe (tools/envmap_probe.py): an emission whose
    sigmoid reproduces the GT infinity texture on its own lattice scores
    high, a constant-gray map scores low, and the bg/fg split follows the
    GT depth-0 sentinel mask exactly."""
    import numpy as np

    from egonerf_tpu.data.synthetic import _wall_color
    from egonerf_tpu.tools.envmap_probe import bg_fg_split, envmap_vs_gt_psnr

    h = 64
    # invert direction_to_canonical on the (2h, h) storage lattice
    # (models/envmap.py: rows index v=phi, columns index u=cos-theta)
    vi = np.linspace(0.0, 1.0, 2 * h)[:, None]
    ui = np.linspace(0.0, 1.0, h)[None, :]
    cos_t = 2.0 * ui - 1.0
    sin_t = np.sqrt(np.maximum(0.0, 1.0 - cos_t ** 2))
    phi = 2.0 * np.pi * vi - np.pi
    dirs = np.stack([sin_t * np.cos(phi), sin_t * np.sin(phi),
                     np.broadcast_to(cos_t, (2 * h, h))], axis=-1)
    tex = np.clip(_wall_color(dirs), 1e-4, 1.0 - 1e-4)
    good = np.log(tex / (1.0 - tex)).astype(np.float32)  # sigmoid^-1
    assert envmap_vs_gt_psnr(good, h=32, w=64) > 20.0
    flat = np.zeros((2 * h, h, 3), np.float32)  # sigmoid -> 0.5 gray
    assert envmap_vs_gt_psnr(flat, h=32, w=64) < 15.0

    render = np.zeros((4, 4, 3))
    gt = np.zeros((4, 4, 3))
    gt[0, 0] = 1.0  # one wrong pixel, inside the background row
    bg = np.zeros((4, 4), bool)
    bg[0, :] = True
    rec = bg_fg_split(render, gt, bg)
    assert rec["bg_pixel_fraction"] == 0.25
    assert rec["psnr_fg"] > 100.0 and rec["psnr_bg"] < 10.0


def test_enable_compilation_cache(tmp_path, monkeypatch):
    """The persistent-cache helper honors $JAX_CACHE_DIR, creates the
    directory, points jax at it, and disables cleanly (VERDICT r4 #1a:
    the official capture must compile warm even in a fresh container)."""
    import jax

    from egonerf_tpu.tools import enable_compilation_cache

    target = tmp_path / "jc"
    monkeypatch.setenv("JAX_CACHE_DIR", str(target))
    try:
        assert enable_compilation_cache() == str(target)
        assert target.is_dir()
        assert jax.config.jax_compilation_cache_dir == str(target)
    finally:
        # restore the suite-wide repo-local cache for subsequent tests
        monkeypatch.delenv("JAX_CACHE_DIR")
        enable_compilation_cache()

    monkeypatch.setenv("JAX_CACHE_DISABLE", "1")
    assert enable_compilation_cache() is None

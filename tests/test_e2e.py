"""End-to-end slice: train EgoNeRF on the procedural scene via the full
Trainer and watch the loss fall; checkpoint round-trip; multi-device step.

This is the framework's replacement for the reference's metric-based
manual verification (SURVEY.md §4)."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from egonerf_tpu.train.config import load_config
from egonerf_tpu.train.trainer import Trainer


def tiny_cfg(tmp_path, **over):
    base = dict(
        dataset_name="synthetic", model_name="EgoNeRF", coordinates_name="yinyang",
        exp_sampling=True, interval_th=True, r0="0.05", resampling=True,
        use_coarse_sample=True, n_coarse=16, n_fine=16, batch_size=512,
        n_iters=100, N_voxel_init=24**3, N_voxel_final=24**3,
        n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
        shadingMode="MLP_Fea", fea2denseAct="softplus", density_shift="-8",
        featureC=32, view_pe=2, fea_pe=2,
        lr_init=0.02, lr_basis=1e-3, sparsity_lambda=0,
        near_far="[0.05, 8.5]", progress_refresh_rate=10,
        basedir=str(tmp_path), expname="e2e", N_vis=0, i_weights=10**7,
        eval_chunk=512,
    )
    base.update(over)
    return load_config(overrides=base)


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    cfg = tiny_cfg(tmp)
    trainer = Trainer(cfg)
    # record initial loss by running one eval-style mse
    trainer.train()
    return trainer, tmp


def test_training_reduces_loss(trained):
    trainer, tmp = trained
    metrics = [l for l in open(os.path.join(trainer.logdir, "metrics.jsonl"))]
    import json

    mses = [json.loads(l)["value"] for l in metrics if json.loads(l)["tag"] == "train/mse"]
    assert len(mses) >= 3
    assert mses[-1] < mses[0] * 0.7, f"mse did not fall: {mses[0]} -> {mses[-1]}"


def test_checkpoint_roundtrip(trained):
    trainer, tmp = trained
    from egonerf_tpu.train.checkpoint import restore_params

    path = os.path.join(trainer.logdir, "roundtrip.npz")
    trainer.save(path, 40)
    template = trainer.model.init_params(jax.random.PRNGKey(9))
    restored, header, _ = restore_params(template, path)
    assert header["global_step"] == 40
    orig = jax.device_get(trainer.params)
    rest = jax.device_get(restored)
    for a, b in zip(jax.tree_util.tree_leaves(orig), jax.tree_util.tree_leaves(rest)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # coordinate spec reproduces identical normalization
    from egonerf_tpu.coords import coords_from_spec

    coords2 = coords_from_spec(header["coords_spec"])
    pts = jnp.asarray(np.random.default_rng(0).uniform(-3, 3, (32, 3)).astype(np.float32))
    a = np.asarray(trainer.coords.normalize_coord(trainer.coords.from_cartesian(pts)))
    b = np.asarray(coords2.normalize_coord(coords2.from_cartesian(pts)))
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_resume_continues_from_checkpoint(trained, tmp_path):
    trainer, tmp = trained
    cfg = tiny_cfg(tmp_path, n_iters=4)
    # plant the old checkpoint in the new logdir and resume from it
    os.makedirs(os.path.join(str(tmp_path), "e2e"), exist_ok=True)
    trainer.save(os.path.join(str(tmp_path), "e2e", "ck_000002.npz"), 2)
    t2 = Trainer(cfg)
    assert t2.start_step == 2
    t2.train()  # runs the remaining 2 iters without error


def test_latest_checkpoint_prefers_highest_step(tmp_path):
    """The final '{expname}.npz' sorts lexically BEFORE '{expname}_NNNNNN'
    intermediates ('.' < '_'), so selection must go by the stored
    global_step — a name sort would resume a completed run from its last
    periodic snapshot and re-train (then re-evaluate) the stale tail."""
    from egonerf_tpu.train.checkpoint import (checkpoint_step,
                                              latest_checkpoint,
                                              save_checkpoint)

    params = {"a": np.zeros(3, np.float32)}
    meta = dict(coords_spec={"k": 1}, model_meta={})
    save_checkpoint(str(tmp_path / "e2e_000250.npz"), params,
                    global_step=250, **meta)
    save_checkpoint(str(tmp_path / "e2e.npz"), params, global_step=300, **meta)
    assert latest_checkpoint(str(tmp_path)).endswith("e2e.npz")
    assert checkpoint_step(str(tmp_path / "e2e_000250.npz")) == 250
    # and the reverse: a LONGER rerun's intermediate beats a stale final
    save_checkpoint(str(tmp_path / "e2e_000350.npz"), params,
                    global_step=350, **meta)
    assert latest_checkpoint(str(tmp_path)).endswith("e2e_000350.npz")
    # non-checkpoint npz files are never preferred
    np.savez(str(tmp_path / "zz_other.npz"), x=np.zeros(2))
    assert latest_checkpoint(str(tmp_path)).endswith("e2e_000350.npz")


def test_resume_schedule_realignment_helpers(tmp_path):
    """Resume past the first alpha-mask update lands on L1_weight_rest
    (reference switches at train.py:211,367 and never revisits it)."""
    from egonerf_tpu.train.trainer import initial_l1_weight

    cfg = tiny_cfg(tmp_path, update_AlphaMask_list="[2000,4000]",
                   L1_weight_initial=8e-5, L1_weight_rest=4e-5)
    assert initial_l1_weight(cfg, 0) == pytest.approx(8e-5)
    assert initial_l1_weight(cfg, 2000) == pytest.approx(8e-5)  # re-fires in-loop
    assert initial_l1_weight(cfg, 2001) == pytest.approx(4e-5)
    assert initial_l1_weight(cfg, 9000) == pytest.approx(4e-5)
    cfg0 = tiny_cfg(tmp_path, update_AlphaMask_list="[]")
    assert initial_l1_weight(cfg0, 9000) == pytest.approx(cfg0.L1_weight_initial)


def test_resumed_envmap_run_uses_main_loop_lr(tmp_path):
    """A resumed run skips envmap pretraining, so its optimizer must carry
    the MAIN-loop envmap lr — not lr_envmap_pretrain (which used to leak
    through the skipped post-pretrain rebuild and train the envmap at 4x
    the intended rate for the rest of the run)."""
    over = dict(use_envmap=True, iter_pretrain_envmap=50,
                lr_envmap=0.005, lr_envmap_pretrain=0.02, n_iters=4)
    # a FRESH run gets the pretrain lr only inside pretrain_envmap itself,
    # so its init-time optimizer carries the main lr
    t_fresh = Trainer(tiny_cfg(tmp_path, expname="fresh_env", **over))
    assert t_fresh.start_step == 0
    assert t_fresh.lr_groups["envmap"] == pytest.approx(0.005)
    # plant an envmap-bearing checkpoint and resume into it
    os.makedirs(os.path.join(str(tmp_path), "e2e"), exist_ok=True)
    t_fresh.save(os.path.join(str(tmp_path), "e2e", "ck_000002.npz"), 2)
    t2 = Trainer(tiny_cfg(tmp_path, **over))
    assert t2.start_step == 2
    assert t2.lr_groups["envmap"] == pytest.approx(0.005)


def test_use_depth_without_depths_fails_loudly(tmp_path):
    """use_depth=True on a depthless dataset must be a config error, not
    silent zero-supervision (device path) or a trace-time IndexError."""
    from egonerf_tpu.data.datasets import SyntheticEgoDataset

    # the synthetic dataset HAS analytic depths, so construction succeeds...
    t = Trainer(tiny_cfg(tmp_path, expname="nodepth", use_depth=True,
                         depth_lambda=0.01, n_iters=1))
    ds = dict(near_far=t.cfg.near_far, n_train=2, n_test=1, height=20, width=40)
    train_ds = SyntheticEgoDataset(split="train", is_stack=False, **ds)
    test_ds = SyntheticEgoDataset(split="test", is_stack=True, **ds)
    train_ds.all_depths = None  # ...now simulate a dataset with no gt depth
    with pytest.raises(ValueError, match="no depths"):
        t.set_datasets(train_ds, test_ds)


def test_multidevice_step_matches_shapes(trained):
    """The driver separately dry-runs the sharded path; here we check the
    trainer wires a mesh when >1 device is visible."""
    trainer, _ = trained
    assert jax.device_count() == 8  # conftest forces the virtual CPU mesh
    assert trainer.mesh.devices.size == 8
    assert trainer.multi_device


def test_trainer_sharded_losses_match_single_device(tmp_path):
    """The REAL trainer step on the 8-way mesh must reproduce the
    single-device loss sequence (same seed, same in-step id draws from the
    replicated key) — guards _make_step's sharded device-sampling branch,
    not just the raw step function (which test_parallel.py covers)."""
    import json

    def run(mesh_n, name):
        cfg = tiny_cfg(tmp_path, expname=name, n_iters=16,
                       progress_refresh_rate=2, mesh_shape=[mesh_n])
        t = Trainer(cfg)
        assert t.multi_device == (mesh_n > 1)
        t.train()
        with open(os.path.join(t.logdir, "metrics.jsonl")) as f:
            return [json.loads(l)["value"] for l in f
                    if json.loads(l)["tag"] == "train/mse"]

    mses1 = run(1, "mesh1")
    mses8 = run(8, "mesh8")
    assert len(mses1) == len(mses8) >= 4
    # identical batches/schedules — only the psum reduction order differs
    np.testing.assert_allclose(mses1, mses8, rtol=5e-4)


def test_forced_sharded_mesh1_matches_plain(tmp_path, monkeypatch):
    """TPU_FORCE_SHARDED=1 routes a 1-device mesh through the full sharded
    machinery (the BASELINE.md mesh-tax instrument): shardings are trivial
    on one device, so the loss sequence must be bit-compatible with the
    plain path."""
    import json

    def run(name, forced):
        if forced:
            monkeypatch.setenv("TPU_FORCE_SHARDED", "1")
        else:
            monkeypatch.delenv("TPU_FORCE_SHARDED", raising=False)
        cfg = tiny_cfg(tmp_path, expname=name, n_iters=8,
                       progress_refresh_rate=2, mesh_shape=[1])
        t = Trainer(cfg)
        assert t.multi_device == forced
        t.train()
        with open(os.path.join(t.logdir, "metrics.jsonl")) as f:
            return [json.loads(l)["value"] for l in f
                    if json.loads(l)["tag"] == "train/mse"]

    plain = run("force_off", forced=False)
    forced = run("force_on", forced=True)
    assert len(plain) == len(forced) >= 2
    np.testing.assert_allclose(plain, forced, rtol=1e-6)


def test_evaluation_produces_images(trained):
    trainer, tmp = trained
    from egonerf_tpu.render.renderer import evaluation

    out_dir = os.path.join(trainer.logdir, "eval_test")
    psnrs = evaluation(trainer.test_dataset, trainer.model, trainer.params,
                       trainer.renderer, save_path=out_dir, n_vis=1,
                       compute_extra_metrics=True)
    assert len(psnrs) >= 1
    assert os.path.exists(os.path.join(out_dir, "000.png"))
    assert os.path.exists(os.path.join(out_dir, "mean.txt"))
    # fixed 5-column schema [psnr, ssim, ws_ssim, lpips_alex, lpips_vgg];
    # lpips columns are nan when the optional weights are absent
    vals = np.atleast_1d(np.loadtxt(os.path.join(out_dir, "mean.txt")))
    assert vals.shape == (5,)
    assert np.isfinite(vals[:3]).all()
    # mean.json carries the labeled schema, incl. WS-PSNR (the reference's
    # own TODO at renderer.py:89 — first-class here, json-only so mean.txt
    # keeps its reference-compatible 5 columns)
    import json

    with open(os.path.join(out_dir, "mean.json")) as f:
        summary = json.load(f)
    for k in ("psnr", "ssim", "ws_ssim", "ws_psnr"):
        assert isinstance(summary[k], float) and np.isfinite(summary[k]), k
    assert summary["n_images"] == len(psnrs)


def test_multidevice_schedule_boundaries(tmp_path):
    """Drive the REAL trainer on the 8-way mesh across an upsample AND an
    alpha-mask update (VERDICT r2 weak #4): re-replication of the surgered
    params, fresh optimizer state, donated-buffer reuse and the step-cache
    flushes all have to compose.  Asserts loss continuity through both
    boundaries and that params come out replicated on the full mesh."""
    import json

    cfg = tiny_cfg(tmp_path, expname="sched8", n_iters=40,
                   progress_refresh_rate=1, mesh_shape=[8],
                   N_voxel_final=30**3, upsamp_list=[12],
                   update_AlphaMask_list=[24])
    t = Trainer(cfg)
    assert t.multi_device
    reso_before = list(t.reso_cur)
    t.train()
    assert list(t.reso_cur) != reso_before  # the upsample actually ran
    assert t.model.alpha_mask is not None   # the alpha bake actually ran

    with open(os.path.join(t.logdir, "metrics.jsonl")) as f:
        mses = [json.loads(l)["value"] for l in f
                if json.loads(l)["tag"] == "train/mse"]
    assert len(mses) >= 36
    # loss continues to fall across both boundaries; no post-surgery blowup
    assert mses[-1] < mses[0] * 0.8, f"mse did not fall: {mses[0]} -> {mses[-1]}"
    assert min(mses[13:]) <= min(mses[:13]) * 1.5, "loss exploded after upsample"

    # every param leaf must be fully replicated over all 8 devices again
    for leaf in jax.tree_util.tree_leaves(t.params):
        assert len(leaf.sharding.device_set) == 8
        assert leaf.sharding.is_fully_replicated


@pytest.mark.parametrize("chart", [
    "sphere", "balanced_sphere", "directional_sphere",
    "directional_balanced_sphere", "euler_sphere", "cylinder",
    "generic_sphere",
])
def test_every_chart_trains_tensorf(tmp_path, chart):
    """Every non-yinyang coordinate chart drives a real TensorVMSplit
    training run end to end (the reference registry pairs any chart with
    the TensorBase family, models/__init__.py:5-15; yinyang/EgoNeRF and
    xyz are covered by the rest of the suite)."""
    import json

    cfg = load_config(overrides=dict(
        dataset_name="synthetic", model_name="TensorVMSplit",
        coordinates_name=chart,
        exp_sampling=(chart == "generic_sphere"), r0="0.05",
        interval_th=(chart == "generic_sphere"),
        n_coarse=12, batch_size=256,
        n_iters=8, N_voxel_init=14**3, N_voxel_final=14**3,
        n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
        shadingMode="MLP_Fea", density_shift="-8", featureC=32,
        view_pe=2, fea_pe=2, lr_init=0.02, sparsity_lambda=0,
        near_far="[0.05, 8.5]", basedir=str(tmp_path), expname=f"chart_{chart}",
        N_vis=0, i_weights=10**7, eval_chunk=256, steps_per_call=4,
        progress_refresh_rate=1,
    ))
    t = Trainer(cfg)
    t.train()
    with open(os.path.join(t.logdir, "metrics.jsonl")) as f:
        mses = [json.loads(l)["value"] for l in f
                if json.loads(l)["tag"] == "train/mse"]
    assert len(mses) >= 8
    assert np.isfinite(mses).all(), f"{chart}: non-finite loss {mses}"
    assert mses[-1] < mses[0], f"{chart}: mse did not fall {mses[0]} -> {mses[-1]}"


@pytest.mark.parametrize("model_name", ["TensorVM", "TensorCP"])
def test_tensorf_variants_train_e2e(tmp_path, model_name):
    """TensorVM (fused planes) and TensorCP (rank-1 lines) drive the full
    Trainer end to end, not just model-level forward/grad tests
    (reference: models/tensoRF.py:5-124, 287-413)."""
    import json

    cfg = load_config(overrides=dict(
        dataset_name="synthetic", model_name=model_name,
        coordinates_name="xyz", n_coarse=12, batch_size=256,
        n_iters=8, N_voxel_init=14**3, N_voxel_final=14**3,
        n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
        shadingMode="MLP_Fea", density_shift="-8", featureC=32,
        view_pe=2, fea_pe=2, lr_init=0.02, sparsity_lambda=0,
        near_far="[0.05, 8.5]", basedir=str(tmp_path),
        expname=f"var_{model_name}",
        N_vis=0, i_weights=10**7, eval_chunk=256, steps_per_call=4,
        progress_refresh_rate=1,
    ))
    t = Trainer(cfg)
    t.train()
    with open(os.path.join(t.logdir, "metrics.jsonl")) as f:
        mses = [json.loads(l)["value"] for l in f
                if json.loads(l)["tag"] == "train/mse"]
    assert len(mses) >= 8
    assert np.isfinite(mses).all()
    assert mses[-1] < mses[0], f"{model_name}: {mses[0]} -> {mses[-1]}"


def test_occ_probe_covers_all_rays(trained):
    """The occupancy probe (tools/occ_probe.py) must include every ray in
    its statistics: the chunk loop pads the per-image tail to the compiled
    shape instead of dropping it, and an image smaller than one chunk
    (the former crash case) still probes cleanly."""
    trainer, tmp = trained
    from egonerf_tpu.tools import occ_probe

    rec = occ_probe._run(trainer.logdir, [8, 16], n_train=2, n_test=1,
                         height=20, width=40, chunk=512)
    assert rec["n_rays"] == 800 and rec["n_chunks"] == 2  # 512 + 288 tail
    assert 0.0 <= rec["occupied_sample_frac"] <= 1.0
    rec2 = occ_probe._run(trainer.logdir, [8], n_train=2, n_test=1,
                          height=10, width=20, chunk=4096)
    assert rec2["n_rays"] == 200 and rec2["n_chunks"] == 1

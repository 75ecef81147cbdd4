"""Ricoh-style on-disk end-to-end: a synthesized egocentric capture
(tools/make_egocentric_capture) drives the REAL
``EgocentricVideoDataset -> pose_descriptor -> train -> eval`` pipeline
from files on disk — the path real captures take (reference:
dataLoader/dataset_egocentric_video.py:13-136, pose_descriptor.py:20-139).
"""
import os

import numpy as np
import pytest

from egonerf_tpu.data.datasets import EgocentricVideoDataset
from egonerf_tpu.data.ray_utils import get_ray_directions_360, get_rays
from egonerf_tpu.tools.make_egocentric_capture import make_capture

H, W = 120, 240  # on-disk equirect size; downsample maps 1920x960 onto it
DOWNSAMPLE = 1920 / W
ROI = [0.05, 0.95, 0.0, 1.0]


@pytest.fixture(scope="module")
def capture(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("ricoh_synth"))
    poses = make_capture(out, n_frames=8, height=H, n_test=2, seed=3)
    return out, poses


@pytest.mark.parametrize("method", ["colmap", "openvslam"])
def test_pose_descriptor_roundtrip_on_disk(capture, method):
    """Poses parsed from the on-disk descriptor files must equal the exact
    render poses (the capture pre-normalizes the trajectory, so the
    loader's normalize_pose is the identity)."""
    out, poses = capture
    ds = EgocentricVideoDataset(data_dir=out, split="train", is_stack=False,
                                downsample=DOWNSAMPLE, near_far=(0.05, 9.0),
                                roi=ROI, localization_method=method)
    with open(os.path.join(out, "train.txt")) as f:
        names = [l.strip() for l in f if l.strip()]
    idx = [int(n.split("_")[1]) for n in names]
    np.testing.assert_allclose(ds.poses, poses[idx].astype(np.float32),
                               atol=1e-5, err_msg=method)


def test_rays_and_images_match_render(capture):
    """The loaded ray bundle and roi-cropped pixels must reproduce what the
    capture rendered (pixels to png-quantization tolerance)."""
    out, poses = capture
    ds = EgocentricVideoDataset(data_dir=out, split="test", is_stack=True,
                                downsample=DOWNSAMPLE, near_far=(0.05, 9.0),
                                roi=ROI, localization_method="colmap")
    from egonerf_tpu.data.synthetic import trace_rays

    dirs = get_ray_directions_360(H, W)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    with open(os.path.join(out, "test.txt")) as f:
        names = [l.strip() for l in f if l.strip()]
    for j, name in enumerate(names):
        k = int(name.split("_")[1])
        rays_o, rays_d = get_rays(dirs, poses[k].astype(np.float32), roi=ROI)
        np.testing.assert_allclose(ds.all_rays[j, :, :3], rays_o, atol=1e-5)
        np.testing.assert_allclose(ds.all_rays[j, :, 3:], rays_d, atol=1e-5)
        rgb, _ = trace_rays(rays_o, rays_d, 8.0, "wall")
        got = ds.all_rgbs[j].reshape(-1, 3)
        assert np.abs(got - np.clip(rgb, 0, 1)).max() < 1.5 / 255


def test_egocentric_train_eval_end_to_end(capture, tmp_path):
    """The full driver on the on-disk capture: dataset_name=egocentric,
    theta-importance sampling over the roi, training reduces mse and eval
    renders against the held-out frames."""
    from egonerf_tpu.render.renderer import evaluation
    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    out, _ = capture
    cfg = load_config(overrides=dict(
        dataset_name="egocentric", datadir=out, model_name="EgoNeRF",
        coordinates_name="yinyang", exp_sampling=True, interval_th=True,
        r0="0.05", resampling=True, use_coarse_sample=True,
        downsample_train=DOWNSAMPLE, downsample_test=DOWNSAMPLE,
        roi=str(ROI), localization_method="colmap",
        sampling_method="theta_importance", theta_importance_lambda=4.0,
        n_coarse=16, n_fine=16, batch_size=512, n_iters=60,
        N_voxel_init=24**3, N_voxel_final=24**3,
        n_lamb_sigma="[4,4,4]", n_lamb_sh="[8,8,8]", data_dim_color=12,
        shadingMode="MLP_Fea", fea2denseAct="softplus", density_shift="-8",
        featureC=32, view_pe=2, fea_pe=2, lr_init=0.02, lr_basis=1e-3,
        sparsity_lambda=0, near_far="[0.05, 9.0]",
        progress_refresh_rate=20, basedir=str(tmp_path), expname="ricoh_e2e",
        N_vis=0, i_weights=10**7, eval_chunk=512, steps_per_call=10,
    ))
    trainer = Trainer(cfg)
    assert isinstance(trainer.train_dataset, EgocentricVideoDataset)
    assert trainer.train_dataset.img_wh == (
        W, int(ROI[1] * H) - int(ROI[0] * H))
    trainer.train()
    mses = [m["mse"] for m in trainer.log.rows if "mse" in m] \
        if hasattr(trainer.log, "rows") else []
    psnrs = evaluation(trainer.test_dataset, trainer.model, trainer.params,
                       trainer.renderer, save_path=None,
                       compute_extra_metrics=False)
    assert len(psnrs) == 2
    # 60 tiny iters: just demand real signal over a random field (~5-6 dB)
    assert float(np.mean(psnrs)) > 10.0, psnrs

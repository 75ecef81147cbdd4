"""Dataset loader tests against synthetic on-disk fixtures shaped like each
real dataset layout (OmniBlender transforms.json, Ricoh/egocentric COLMAP
poses, OmniScenes pose txt, LLFF poses_bounds.npy)."""
import json
import os

import numpy as np
import pytest
from PIL import Image

from egonerf_tpu.data.datasets import (
    EgocentricVideoDataset,
    LLFFDataset,
    OmniBlenderDataset,
    OmniscenesDataset,
)


def _write_img(path, w, h, seed=0):
    rng = np.random.default_rng(seed)
    arr = (rng.uniform(0, 255, (h, w, 3))).astype(np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def omniblender_root(tmp_path):
    root = tmp_path / "scene"
    (root / "images").mkdir(parents=True)
    frames = []
    names = [f"cam_{i:03d}.png" for i in range(4)]
    for i, name in enumerate(names):
        _write_img(root / "images" / name, 20, 10, seed=i)
        c2w = np.eye(4)
        c2w[:3, 3] = [0.1 * i, 0.0, 0.05 * i]
        frames.append({"file_path": name, "transform_matrix": c2w.tolist()})
    meta = {"indoor": True, "frames": frames}
    (root / "transform.json").write_text(json.dumps(meta))
    (root / "train.txt").write_text("\n".join(n.split(".")[0] for n in names[:3]))
    (root / "test.txt").write_text(names[3].split(".")[0])
    return str(root)


def test_omniblender_loader(omniblender_root):
    ds = OmniBlenderDataset(data_dir=omniblender_root, split="train",
                            downsample=100.0, near_far=[0.1, 5.0])
    # downsample 100 -> 20x10 images
    assert ds.img_wh == (20, 10)
    assert ds.all_rays.shape == (3 * 200, 6)
    assert ds.all_rgbs.shape == (3 * 200, 3)
    # directions are unit
    np.testing.assert_allclose(np.linalg.norm(ds.all_rays[:, 3:], axis=-1), 1.0, atol=1e-5)
    assert ds.scene_bbox.shape == (2, 3)
    ds_test = OmniBlenderDataset(data_dir=omniblender_root, split="test",
                                 is_stack=True, downsample=100.0, near_far=[0.1, 5.0])
    assert ds_test.all_rays.shape == (1, 200, 6)
    assert ds_test.all_rgbs.shape == (1, 10, 20, 3)


def test_omniblender_roi_crops_rays_and_rgbs_together(omniblender_root):
    """Non-default roi must crop images AND rays to the same raster (the
    reference crops only the rays, silently misaligning every training
    pair at roi != full — dataset_omniblender.py:70-84)."""
    roi = [0.0, 0.8, 0.0, 1.0]
    ds = OmniBlenderDataset(data_dir=omniblender_root, split="train",
                            downsample=100.0, near_far=[0.1, 5.0], roi=roi)
    assert ds.img_wh == (20, 8)          # cropped raster
    assert ds.img_wh_origin == (20, 10)  # full frame
    assert ds.all_rays.shape == (3 * 160, 6)
    assert ds.all_rgbs.shape == (3 * 160, 3)
    # the kept rgbs are exactly the TOP 8 rows of each image
    full = OmniBlenderDataset(data_dir=omniblender_root, split="train",
                              downsample=100.0, near_far=[0.1, 5.0])
    np.testing.assert_array_equal(
        ds.all_rgbs.reshape(3, 8, 20, 3),
        full.all_rgbs.reshape(3, 10, 20, 3)[:, :8])
    np.testing.assert_array_equal(
        ds.all_rays.reshape(3, 8, 20, 6),
        full.all_rays.reshape(3, 10, 20, 6)[:, :8])


@pytest.fixture
def egocentric_root(tmp_path):
    root = tmp_path / "rico"
    (root / "imgs").mkdir(parents=True)
    (root / "output_dir" / "colmap").mkdir(parents=True)
    names = [f"f{i:04d}" for i in range(3)]
    for i, n in enumerate(names):
        _write_img(root / "imgs" / f"{n}.png", 1920 // 96, 960 // 96, seed=i)
    # COLMAP images.txt: 4 header lines then alternating meta/points lines
    lines = ["# c1", "# c2", "# c3", "# c4"]
    for i, n in enumerate(names):
        lines.append(f"{i+1} 1 0 0 0 {0.1*i} 0 {0.2*i} 1 {n}.png")
        lines.append("0 0 -1")
    (root / "output_dir" / "colmap" / "images.txt").write_text("\n".join(lines))
    (root / "train.txt").write_text("\n".join(names[:2]))
    (root / "test.txt").write_text(names[2])
    return str(root)


def test_egocentric_loader(egocentric_root):
    ds = EgocentricVideoDataset(data_dir=egocentric_root, split="train",
                                downsample=96.0, near_far=[0.1, 10.0],
                                localization_method="colmap")
    w, h = ds.img_wh
    assert ds.all_rays.shape == (2 * w * h, 6)
    assert ds.all_rgbs.shape == (2 * w * h, 3)
    # trajectory normalized to ~unit mean radius
    centers = ds.poses[:, :3, 3]
    assert np.isfinite(centers).all()


def test_omniscenes_loader(tmp_path):
    base = tmp_path
    room = "room1"
    (base / "turtlebot_pano" / room).mkdir(parents=True)
    (base / "turtlebot_pose" / room).mkdir(parents=True)
    for i in range(33):
        _write_img(base / "turtlebot_pano" / room / f"pano{i}.jpg", 20, 10, seed=i)
        pose = np.hstack([np.eye(3), [[0.01 * i], [0.0], [0.02 * i]]])
        np.savetxt(base / "turtlebot_pose" / room / f"pose{i}.txt", pose)
    ds = OmniscenesDataset(data_dir=str(base / room), split="train",
                           downsample=96.0, near_far=[0.1, 10.0])
    w, h = ds.img_wh
    assert h == int(10 * 0.9)  # fixed roi crops the bottom 10%
    # last-31:-1 train split
    assert ds.all_rays.shape == (30 * w * h, 6)
    ds_t = OmniscenesDataset(data_dir=str(base / room), split="test",
                             is_stack=True, downsample=96.0, near_far=[0.1, 10.0])
    assert ds_t.all_rays.shape[0] == 1


@pytest.fixture
def llff_root(tmp_path):
    root = tmp_path / "fern"
    (root / "images").mkdir(parents=True)
    n = 10
    h, w, focal = 12.0, 16.0, 20.0
    poses_bounds = np.zeros((n, 17))
    for i in range(n):
        # "down right back" pose with hwf column
        m = np.eye(4)[:3]
        m[:3, 3] = [0.05 * i, 0.02 * i, 0.0]
        pose = np.concatenate([m, np.array([[h], [w], [focal]])], axis=1)
        poses_bounds[i, :15] = pose.reshape(-1)
        poses_bounds[i, 15:] = [1.0, 10.0]
        _write_img(root / "images" / f"img_{i:03d}.png", int(w), int(h), seed=i)
    np.save(root / "poses_bounds.npy", poses_bounds)
    return str(root)


def test_llff_loader(llff_root):
    ds = LLFFDataset(data_dir=llff_root, split="train", near_far=[1.0, 10.0])
    w, h = ds.img_wh
    assert (w, h) == (16, 12)
    # every-8th frame is test -> 10 - 2 = 8 train images
    assert ds.all_rays.shape == (8 * w * h, 6)
    assert ds.render_path.shape[0] == 120  # spiral trajectory baked
    ds_t = LLFFDataset(data_dir=llff_root, split="test", is_stack=True,
                       near_far=[1.0, 10.0])
    assert ds_t.all_rays.shape[0] == 2


def test_colmap_parsers_survive_zero_observation_images(tmp_path):
    """COLMAP writes an EMPTY points2D line for a registered image with no
    observations; both images.txt parsers must keep the image/points2D
    alternation across it instead of parsing point data as poses."""
    body = (
        "1 0.99 0.01 0.02 0.03 0.1 0.2 0.3 1 img_a.png\n"
        "\n"  # zero-observation image: empty points2D line
        "2 0.98 0.02 0.03 0.04 0.4 0.5 0.6 1 img_b.png\n"
        "100.5 200.3 17 300.1 400.2 18\n"
        "3 0.97 0.03 0.04 0.05 0.7 0.8 0.9 1 img_c.png\n"
        "1.0 2.0 3\n")

    from egonerf_tpu.data.pose_descriptor import ColmapPoseDescriptor

    sub = tmp_path / "output_dir" / "colmap"
    sub.mkdir(parents=True)
    (sub / "images.txt").write_text("# h\n# h\n# h\n# h\n" + body)
    pd = ColmapPoseDescriptor()
    pd.read_pose_file(str(tmp_path))
    assert sorted(pd.poses_dict) == ["img_a.png", "img_b.png", "img_c.png"]

    from egonerf_tpu.tools.colmap2nerf import read_images_text

    (tmp_path / "images2.txt").write_text("# h\n" + body)
    imgs = read_images_text(str(tmp_path / "images2.txt"))
    assert [i["name"] for i in imgs] == ["img_a.png", "img_b.png", "img_c.png"]

"""COLMAP text model -> transforms.json converter.

Fresh minimal equivalent of the converter the reference vendors from
instant-ngp (reference: dataLoader/colmap2nerf.py): reads a COLMAP sparse
reconstruction in text form and emits the transforms.json consumed by
:class:`OmniBlenderDataset`.  Frame extraction / COLMAP invocation are thin
subprocess wrappers gated on the binaries existing.

Usage:
    python -m egonerf_tpu.tools.colmap2nerf --text sparse/0 --out transforms.json
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys

import numpy as np


def qvec2rotmat(q):
    """COLMAP (w, x, y, z) quaternion -> rotation matrix."""
    w, x, y, z = q
    return np.array([
        [1 - 2 * y * y - 2 * z * z, 2 * x * y - 2 * z * w, 2 * x * z + 2 * y * w],
        [2 * x * y + 2 * z * w, 1 - 2 * x * x - 2 * z * z, 2 * y * z - 2 * x * w],
        [2 * x * z - 2 * y * w, 2 * y * z + 2 * x * w, 1 - 2 * x * x - 2 * y * y],
    ])


def read_cameras_text(path: str) -> dict:
    cams = {}
    with open(path) as f:
        for line in f:
            if line.startswith("#") or not line.strip():
                continue
            toks = line.split()
            cams[int(toks[0])] = {
                "model": toks[1],
                "w": int(toks[2]),
                "h": int(toks[3]),
                "params": [float(t) for t in toks[4:]],
            }
    return cams


def read_images_text(path: str) -> list:
    out = []
    with open(path) as f:
        # keep BLANK lines: an image with zero observations gets an EMPTY
        # points2D line, and dropping it would flip the image/points2D
        # alternation for every following entry
        lines = [l for l in f if not l.startswith("#")]
    for meta_line in lines[::2]:  # every other line is 2-D point data
        toks = meta_line.split()
        if not toks:
            continue  # trailing blank line
        out.append({
            "qvec": [float(t) for t in toks[1:5]],
            "tvec": [float(t) for t in toks[5:8]],
            "camera_id": int(toks[8]),
            "name": toks[9],
        })
    return out


def colmap_to_transforms(text_dir: str, out_path: str, aabb_scale: int = 16,
                         indoor: bool = True) -> dict:
    cams = read_cameras_text(os.path.join(text_dir, "cameras.txt"))
    images = read_images_text(os.path.join(text_dir, "images.txt"))
    cam = next(iter(cams.values()))
    params = cam["params"]
    fl_x = params[0]
    fl_y = params[1] if cam["model"] in ("PINHOLE", "OPENCV") else params[0]

    frames = []
    for im in sorted(images, key=lambda i: i["name"]):
        rot = qvec2rotmat(im["qvec"])
        w2c = np.eye(4)
        w2c[:3, :3] = rot
        w2c[:3, 3] = im["tvec"]
        c2w = np.linalg.inv(w2c)
        # flip to the nerf camera convention (+y up, -z forward)
        c2w[0:3, 1:3] *= -1
        frames.append({"file_path": im["name"],
                       "transform_matrix": c2w.tolist()})

    out = {
        "fl_x": fl_x, "fl_y": fl_y,
        "w": cam["w"], "h": cam["h"],
        "camera_angle_x": 2 * np.arctan(cam["w"] / (2 * fl_x)),
        "aabb_scale": aabb_scale,
        "indoor": indoor,
        "frames": frames,
    }
    with open(out_path, "w") as f:
        json.dump(out, f, indent=2)
    print(f"wrote {out_path}: {len(frames)} frames")
    return out


def extract_frames(video: str, out_dir: str, fps: float = 2.0) -> None:
    """ffmpeg frame extraction (gated on the binary existing)."""
    if shutil.which("ffmpeg") is None:
        raise RuntimeError("ffmpeg not found on PATH")
    os.makedirs(out_dir, exist_ok=True)
    subprocess.run(["ffmpeg", "-i", video, "-vf", f"fps={fps}",
                    os.path.join(out_dir, "%04d.png")], check=True)


def run_colmap(image_dir: str, workspace: str, matcher: str = "exhaustive") -> None:
    """COLMAP sparse reconstruction (gated on the binary existing)."""
    if shutil.which("colmap") is None:
        raise RuntimeError("colmap not found on PATH")
    os.makedirs(workspace, exist_ok=True)
    db = os.path.join(workspace, "database.db")
    subprocess.run(["colmap", "feature_extractor", "--database_path", db,
                    "--image_path", image_dir], check=True)
    subprocess.run(["colmap", f"{matcher}_matcher", "--database_path", db], check=True)
    sparse = os.path.join(workspace, "sparse")
    os.makedirs(sparse, exist_ok=True)
    subprocess.run(["colmap", "mapper", "--database_path", db,
                    "--image_path", image_dir, "--output_path", sparse], check=True)
    subprocess.run(["colmap", "model_converter", "--input_path",
                    os.path.join(sparse, "0"), "--output_path",
                    os.path.join(sparse, "0"), "--output_type", "TXT"], check=True)


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    text_dir, out_path = None, "transforms.json"
    i = 0
    while i < len(argv):
        if argv[i] == "--text":
            text_dir = argv[i + 1]; i += 2
        elif argv[i] == "--out":
            out_path = argv[i + 1]; i += 2
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
    if not text_dir:
        raise SystemExit(__doc__)
    colmap_to_transforms(text_dir, out_path)


if __name__ == "__main__":
    main()

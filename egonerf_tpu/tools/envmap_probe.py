"""Factorization probe for use_envmap runs on the synthetic 'env' scene.

Three numbers decide whether an envmap run actually factorized the scene
(the measured failure this formalizes: BASELINE.md "Round 5: envmap at
production shape" — an unconverged envmap lets the volume absorb the
background as an opaque far shell that does not generalize across poses):

  1. envmap-only PSNR vs the GT infinity texture — did the map learn?
  2. held-out PSNR split into background/foreground pixels (GT depth==0
     is the background sentinel, data/synthetic.py:94-99) — where does
     the residual live?
  3. the background-pixel fraction, for context.

CPU-only: reads the checkpoint's envmap parameter and the saved test
renders, and re-synthesizes the ground truth from the procedural scene.
No TPU relay / chip lock needed.

Run:  python -m egonerf_tpu.tools.envmap_probe [logdir]
Default logdir=/tmp/egonerf_quality/refscale10k_env.
Writes docs/results_envmap_probe.json.
"""
from __future__ import annotations

import os
import sys


def _psnr(mse: float) -> float:
    import numpy as np

    return float(-10.0 * np.log10(max(mse, 1e-12)))


def envmap_vs_gt_psnr(emission, h: int = 250, w: int = 500) -> float:
    """PSNR of the learned envmap alone against the GT infinity texture,
    evaluated on an h x w equirect direction grid."""
    import numpy as np

    from ..data.ray_utils import get_ray_directions_360
    from ..data.synthetic import _wall_color
    from ..models.envmap import envmap_radiance

    dirs = get_ray_directions_360(h, w).reshape(-1, 3)
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    pred = np.asarray(envmap_radiance(emission, dirs))
    return _psnr(float(((pred - _wall_color(dirs)) ** 2).mean()))


def bg_fg_split(render, gt_rgb, bg_mask) -> dict:
    """Held-out error split by the GT background mask (all float arrays
    in [0,1]; bg_mask bool per pixel)."""
    import numpy as np

    err = (np.asarray(render) - np.asarray(gt_rgb)) ** 2
    bg = np.asarray(bg_mask)
    return {
        "psnr_bg": round(_psnr(float(err[bg].mean())), 2),
        "psnr_fg": round(_psnr(float(err[~bg].mean())), 2),
        "bg_pixel_fraction": round(float(bg.mean()), 3),
    }


def _run(logdir: str, n_train: int = 12, n_test: int = 2,
         height: int = 1000, width: int = 2000) -> dict:
    import numpy as np

    import imageio.v2 as imageio

    from ..data.datasets import SyntheticEgoDataset
    from ..train.config import load_config
    from ..train.trainer import latest_checkpoint

    cfg = load_config(os.path.join(logdir, "args.txt"))
    ckpt_path = cfg.ckpt or latest_checkpoint(logdir)
    if not ckpt_path or not os.path.exists(ckpt_path):
        raise SystemExit(f"no checkpoint under {logdir}")
    # lazy zip access: only the envmap entry is read, not the multi-
    # hundred-MB grid tables
    with np.load(ckpt_path) as ck:
        if "envmap" not in ck.files:
            raise SystemExit(f"{ckpt_path} has no envmap parameter "
                             f"(not a use_envmap run)")
        emission = ck["envmap"].astype(np.float32)

    ds = SyntheticEgoDataset(split="test", is_stack=True, n_train=n_train,
                             n_test=n_test, height=height, width=width,
                             background="env", near_far=cfg.near_far)
    gt = np.asarray(ds.all_rgbs).reshape(n_test, height, width, 3)
    dep = np.asarray(ds.all_depths).reshape(n_test, height, width)

    per_image = []
    for k in range(n_test):
        path = os.path.join(logdir, "imgs_test_all", f"{k:03d}.png")
        if not os.path.exists(path):
            raise SystemExit(f"missing render {path} — run the evaluation "
                             f"first (quality_run leaves imgs_test_all/)")
        im = imageio.imread(path)[..., :3].astype(np.float32) / 255.0
        per_image.append(bg_fg_split(im, gt[k], dep[k] == 0))

    return {
        "logdir": logdir,
        "checkpoint": os.path.basename(ckpt_path),
        "envmap_res": list(emission.shape[:2]),
        "envmap_only_psnr_vs_gt_texture":
            round(envmap_vs_gt_psnr(emission), 2),
        "per_image": per_image,
    }


def main():
    import json

    # CPU-only by contract: the probe must be runnable while a training
    # job holds the TPU (axon ignores JAX_PLATFORMS env — force in-process)
    import jax

    jax.config.update("jax_platforms", "cpu")

    logdir = (sys.argv[1] if len(sys.argv) > 1
              else "/tmp/egonerf_quality/refscale10k_env")
    rec = _run(logdir)
    print(json.dumps(rec, indent=1), flush=True)
    from . import write_results

    write_results("envmap_probe", rec)


if __name__ == "__main__":
    main()

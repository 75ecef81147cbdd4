"""Measure the SHIPPED eval pipeline end to end: ``evaluation()`` at the
production image shape — pipelined double-buffering, trimmed outputs,
host metrics (SSIM/WS-SSIM) and PNG encoding overlapping device compute.

This is the number a user feels running ``--evaluation 1``; bench.py's
``eval_sec_per_image`` times the raw ``render_view`` fetch.  Random-init
params (throughput is shape-bound — same convention as
tools/profile_step.capture_eval).

Usage (TPU):  python -m egonerf_tpu.tools.eval_ship [n_images]
Writes docs/results_eval_ship.json.
"""
from __future__ import annotations

import json
import os
import sys
import time


def main(n_images: int = 4) -> dict:
    import jax

    from ..data.datasets import SyntheticEgoDataset
    from ..presets import production_overrides
    from ..render.renderer import Renderer, evaluation
    from ..train.config import load_config
    from ..train.trainer import Trainer

    n_images = int(n_images)
    cfg = load_config(overrides=production_overrides(
        n_iters=1, basedir="/tmp/egonerf_eval_ship", expname="ship",
        N_vis=0))
    trainer = Trainer(cfg)
    height, width = 1000, 2000
    common = dict(n_train=2, n_test=n_images, height=height, width=width,
                  near_far=cfg.near_far)
    trainer.set_datasets(
        SyntheticEgoDataset(split="train", is_stack=False, **common),
        SyntheticEgoDataset(split="test", is_stack=True, **common))
    test_ds = trainer.test_dataset
    renderer = Renderer.from_config(trainer.model, cfg, test_ds.white_bg)

    out_dir = "/tmp/egonerf_eval_ship/imgs"
    # warm pass compiles every program the loop uses (render + env)
    evaluation(test_ds, trainer.model, trainer.params, renderer,
               save_path=out_dir, n_vis=1, compute_extra_metrics=False,
               save_images=True)
    t0 = time.time()
    evaluation(test_ds, trainer.model, trainer.params, renderer,
               save_path=out_dir, n_vis=-1, compute_extra_metrics=True,
               save_images=True)
    wall = time.time() - t0
    n_rays = height * width
    rec = {
        "image": f"{width}x{height}", "n_images": n_images,
        "chunk": cfg.eval_chunk,
        "includes": "render + fetch + psnr/ssim/ws-ssim + png encoding",
        "sec_per_image_amortized": round(wall / n_images, 3),
        "rays_per_sec": round(n_rays * n_images / wall, 1),
        "platform": jax.devices()[0].platform,
    }
    print(json.dumps(rec, indent=1), flush=True)
    from . import write_results

    write_results("eval_ship", rec)
    return rec


if __name__ == "__main__":
    main(*sys.argv[1:])

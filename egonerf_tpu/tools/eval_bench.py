"""Eval-path throughput bench + ``eval_keep`` cull ablation.

Measures full-image render wall time (the reference prints the same
"elapsed time per image", reference: renderer.py:68-75) from an existing
checkpoint, across a sweep of ``eval_keep`` values (0 = the exact
uncompacted path).  For each value it reports seconds/image, rays/s, PSNR
vs ground truth, and PSNR vs the uncompacted render — the evidence that
sets (or rejects) a recommended eval_keep default.

Usage (on the TPU):
    python -m egonerf_tpu.tools.eval_bench [logdir] [keep,keep,...]

Defaults: logdir=/tmp/egonerf_quality/refscale, keeps=0,192,128,96,64.
The logdir must contain args.txt + a checkpoint from a synthetic-scene
run (quality_run refscale).
"""
from __future__ import annotations

import json
import os
import sys
import time


def _run(logdir: str, keeps, n_repeats: int = 2, n_train: int = 12,
         n_test: int = 2, height: int = 1000, width: int = 2000) -> dict:
    import numpy as np
    import jax

    from ..data.datasets import SyntheticEgoDataset
    from ..render.metrics import psnr as psnr_fn
    from ..render.renderer import Renderer
    from ..train.checkpoint import load_checkpoint
    from ..train.config import load_config
    from ..train.trainer import (Trainer, build_model, coords_from_spec,
                                 latest_checkpoint, restore_params)

    cfg = load_config(os.path.join(logdir, "args.txt"))
    ckpt_path = cfg.ckpt or latest_checkpoint(logdir)
    if not ckpt_path or not os.path.exists(ckpt_path):
        raise SystemExit(f"no checkpoint under {logdir}")

    test_ds = SyntheticEgoDataset(split="test", is_stack=True, n_train=n_train,
                                  n_test=n_test, height=height, width=width,
                                  near_far=cfg.near_far)
    _, header, _ = load_checkpoint(ckpt_path)
    coords = coords_from_spec(header["coords_spec"])
    model = build_model(cfg, test_ds.scene_bbox, coords.resolution, coords,
                        test_ds.near_far, meta=header.get("model_meta"))
    params, header, masks = restore_params(
        model.init_params(jax.random.PRNGKey(0)), ckpt_path)
    Trainer.restore_alpha_mask(model, masks)

    h, w = test_ds.img_wh[1], test_ds.img_wh[0]
    gt = np.asarray(test_ds.all_rgbs[0]).reshape(h, w, 3)
    n_rays = h * w

    # the uncompacted render (keep=0) is the reference every other row's
    # psnr_vs_full is scored against, so it always runs and always runs
    # FIRST — regardless of the order (or absence) of 0 in the sweep list.
    # A trailing "o" on a keep (e.g. "192o") scores that row with the
    # full-resolution ORACLE instead of the coarse pass (the keep-cliff
    # mechanism experiment; models/egonerf.py forward eval_keep_score).
    def _parse(k):
        k = str(k)
        return (int(k[:-1]), "oracle") if k.endswith("o") else (int(k), "coarse")

    keeps = sorted(dict.fromkeys(_parse(k) for k in keeps),
                   key=lambda ks: ks != (0, "coarse"))
    if keeps[:1] != [(0, "coarse")]:
        keeps.insert(0, (0, "coarse"))

    rows = []
    rgb_full = None
    for keep, score in keeps:
        renderer = Renderer.from_config(model, cfg, test_ds.white_bg,
                                        eval_keep=int(keep),
                                        eval_keep_score=score)
        renderer.set_directions(test_ds.directions)
        pose = test_ds.poses[0]
        out = renderer.render_view(params, pose)  # compile + warm
        times = []
        for _ in range(n_repeats):
            t0 = time.time()
            out = renderer.render_view(params, pose)
            times.append(time.time() - t0)  # np outputs force the transfer
        rgb = out["rgb"].reshape(h, w, 3)
        if int(keep) == 0:
            rgb_full = rgb
        row = {
            "eval_keep": int(keep),
            "score": score,
            "sec_per_image": round(min(times), 3),
            "rays_per_sec": round(n_rays / min(times), 1),
            "psnr_vs_gt": round(float(psnr_fn(rgb, gt)), 3),
            "psnr_vs_full": (round(float(psnr_fn(rgb, rgb_full)), 3)
                             if rgb_full is not None and int(keep) != 0 else None),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    return {"logdir": logdir, "ckpt": ckpt_path, "image": f"{w}x{h}",
            "n_samples": f"{cfg.n_coarse}+{cfg.n_fine}",
            "platform": jax.devices()[0].platform, "rows": rows}


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    logdir = args[0] if args else "/tmp/egonerf_quality/refscale"
    keeps = (args[1].split(",") if len(args) > 1
             else [0, 192, 128, 96, 64])
    rec = _run(logdir, keeps)
    print(json.dumps(rec, indent=1), flush=True)
    from . import write_results

    # EGONERF_RESULTS_NAME lets a sweep with a different purpose (e.g. the
    # oracle-scorer mechanism experiment) land beside, not over, the
    # round-3 eval_bench record
    write_results(os.environ.get("EGONERF_RESULTS_NAME", "eval_bench"), rec)


if __name__ == "__main__":
    main()

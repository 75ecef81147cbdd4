"""Eval-path cost split: device compute vs host transfer vs chunk shape.

The full-fidelity eval renders a 2000x1000 image in ~27 s
(docs/results_eval_bench.json) — only 2.5x the *training* rate despite
paying no scatters or optimizer.  Before ablating anything, this probe
answers WHERE the time goes (round-3 verdict ask #2):

  * ``none``    — render, reduce every output to one scalar ON DEVICE,
                  fetch 4 bytes: pure device compute + dispatch.
  * ``rgb``     — fetch only the rgb map (24 MB f32): compute + the one
                  transfer metrics actually need.
  * ``all``     — fetch rgb/depth/bg/env (~80 MB f32): today's
                  ``render_view`` contract.
  * ``pipe2``   — ``all`` but double-buffered: dispatch image k+1 before
                  fetching image k, amortized per-image (what a multi-image
                  eval loop can hide).

Axes: transfer mode x eval chunk size.  Throughput is shape-bound, not
value-bound, so random-init params are fine (same convention as
``tools/profile_step.py::capture_eval``).

Usage:
    python -m egonerf_tpu.tools.eval_probe [out.json]

Reference timing signal: per-image eval print, reference renderer.py:68,75.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def main(out_path: str = "/tmp/eval_probe.json") -> dict:
    import jax
    import jax.numpy as jnp

    from ..data.datasets import SyntheticEgoDataset
    from ..presets import production_overrides
    from ..render.renderer import Renderer
    from ..train.config import load_config
    from ..train.trainer import Trainer

    cfg = load_config(overrides=production_overrides(
        n_iters=1, basedir="/tmp/egonerf_eval_probe", expname="probe",
        N_vis=0))
    trainer = Trainer(cfg)
    height, width = 1000, 2000
    common = dict(n_train=2, n_test=1, height=height, width=width,
                  near_far=cfg.near_far)
    trainer.set_datasets(
        SyntheticEgoDataset(split="train", is_stack=False, **common),
        SyntheticEgoDataset(split="test", is_stack=True, **common))
    test_ds = trainer.test_dataset
    pose = np.asarray(test_ds.poses[0], np.float32)
    n_rays = height * width

    chunks = [int(c) for c in os.environ.get(
        "EVAL_PROBE_CHUNKS", "4096,8192,16384").split(",")]
    modes = os.environ.get("EVAL_PROBE_MODES", "none,rgb,all,pipe2").split(",")
    reps = int(os.environ.get("EVAL_PROBE_REPS", "2"))

    rows = []
    for chunk in chunks:
        renderer = Renderer.from_config(trainer.model, cfg, test_ds.white_bg,
                                        chunk=chunk)
        renderer.set_directions(test_ds.directions)

        # device-array variant of render_view: no host fetch inside
        renderer.render_view(trainer.params, pose)  # compile + warm

        def render_dev():
            return renderer.render_view_async(trainer.params, pose)

        @jax.jit
        def reduce_all(out):
            return sum(jnp.sum(v) for v in out.values())

        for mode in modes:
            if mode == "none":
                def run_once():
                    return float(reduce_all(render_dev()))
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    run_once()
                    times.append(time.perf_counter() - t0)
            elif mode == "rgb":
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    np.asarray(render_dev()["rgb"])
                    times.append(time.perf_counter() - t0)
            elif mode == "all":
                times = []
                for _ in range(reps):
                    t0 = time.perf_counter()
                    out = render_dev()
                    for v in out.values():
                        np.asarray(v)
                    times.append(time.perf_counter() - t0)
            elif mode == "pipe2":
                # amortized: keep one render in flight while fetching the
                # previous one (the multi-image eval loop's best case)
                n_imgs = max(reps, 2)
                pending = render_dev()
                t0 = time.perf_counter()
                for _ in range(n_imgs):
                    nxt = render_dev()
                    for v in pending.values():
                        np.asarray(v)
                    pending = nxt
                times = [(time.perf_counter() - t0) / n_imgs]
            else:
                raise SystemExit(f"unknown mode {mode!r}")
            best = min(times)
            row = {"chunk": chunk, "mode": mode,
                   "sec_per_image": round(best, 3),
                   "rays_per_sec": round(n_rays / best, 1)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    result = {"image": f"{width}x{height}", "n_samples":
              f"{cfg.n_coarse}+{cfg.n_fine}", "platform":
              jax.devices()[0].platform, "reps": reps, "rows": rows}
    with open(out_path, "w") as f:
        json.dump(result, f, indent=1)
    print(f"wrote {out_path}")
    return result


if __name__ == "__main__":
    main(*sys.argv[1:])

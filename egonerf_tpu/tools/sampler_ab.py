"""Sampler-semantics A/B at production shape (VERDICT round-1 item 8).

The in-step device sampler draws ray ids uniformly WITH replacement, while
the reference's SimpleSampler walks an epoch permutation (reference:
sampler.py:11-16) and its ThetaImportanceSampler draws with replacement
from a cos-latitude categorical (reference: sampler.py:28-38).  This tool
trains the same production-shape model under all three semantics on the
same data/seeds and records held-out PSNR at regular checkpoints, so the
framework's default (device uniform) is chosen with evidence rather than
by analogy.

Run on the TPU:  python -m egonerf_tpu.tools.sampler_ab
Writes docs/results_sampler_ab.json and prints a markdown table.
"""
from __future__ import annotations

import json
import os
import time

VARIANTS = [
    # (name, sampling_method, device_sampling)
    ("device_uniform_with_replacement", "simple", True),
    ("host_epoch_permutation", "simple", False),
    ("device_theta_importance", "theta_importance", True),
]

N_ITERS = 3000
VIS_EVERY = 500
IMG_H, IMG_W = 500, 1000
N_TRAIN, N_TEST = 12, 2


def make_config(name: str, method: str, device_sampling: bool, **extra):
    """``extra`` lets variant drivers (e.g. tools/f32_ab) override single
    fields without monkeypatching."""
    from ..presets import production_overrides
    from ..train.config import load_config

    base = dict(
        n_iters=N_ITERS, progress_refresh_rate=500,
        basedir="/tmp/egonerf_sampler_ab", expname=name, N_vis=-1,
        vis_list=str(list(range(VIS_EVERY, N_ITERS + 1, VIS_EVERY))),
        sampling_method=method, device_sampling=device_sampling,
    )
    base.update(extra)  # extra wins, including over this driver's defaults
    return load_config(overrides=production_overrides(**base))


def run_variant(name: str, method: str, device_sampling: bool,
                scene: str = "wall", **extra) -> dict:
    from ..data.datasets import SyntheticEgoDataset
    from ..train.trainer import Trainer

    cfg = make_config(name, method, device_sampling, **extra)
    # fresh run, always: the Trainer auto-resumes from the newest
    # checkpoint in the logdir, so a leftover completed run of the same
    # variant name would skip training entirely and re-report the OLD
    # code's metrics.jsonl as this A/B's result (same guard as
    # quality_run's fresh path)
    logdir = os.path.join(cfg.basedir, cfg.expname)
    if os.path.isdir(logdir):
        import shutil

        shutil.rmtree(logdir)
    trainer = Trainer(cfg)
    common = dict(n_train=N_TRAIN, n_test=N_TEST, height=IMG_H, width=IMG_W,
                  near_far=cfg.near_far, background=scene)
    train_ds = SyntheticEgoDataset(split="train", is_stack=False, **common)
    test_ds = SyntheticEgoDataset(split="test", is_stack=True, **common)
    trainer.set_datasets(train_ds, test_ds)

    t0 = time.time()
    trainer.train()
    wall = time.time() - t0

    curve = {}
    with open(os.path.join(trainer.logdir, "metrics.jsonl")) as f:
        for ln in f:
            rec = json.loads(ln)
            if rec["tag"] == "test/psnr":
                curve[int(rec["step"]) + 1] = round(rec["value"], 3)
    return {"variant": name, "sampling_method": method,
            "device_sampling": device_sampling, "scene": scene,
            "psnr_by_iter": curve, "wall_s": round(wall, 1)}


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    import jax

    dev = jax.devices()[0]
    results = {"device": f"{dev.platform} {getattr(dev, 'device_kind', dev)}",
               "config": {"n_iters": N_ITERS, "batch": 4096,
                          "n_voxel": 27_000_000, "samples": "128+128",
                          "views": f"{N_TRAIN}+{N_TEST} @ {IMG_W}x{IMG_H}"},
               "runs": []}
    for name, method, dev_samp in VARIANTS:
        print(f"=== {name} ===", flush=True)
        results["runs"].append(run_variant(name, method, dev_samp))
        print(json.dumps(results["runs"][-1]), flush=True)

    from . import write_results

    write_results("sampler_ab", results)

    iters = sorted({it for r in results["runs"] for it in r["psnr_by_iter"]})
    print("\n| iteration | " + " | ".join(r["variant"] for r in results["runs"]) + " |")
    print("|---" * (len(results["runs"]) + 1) + "|")
    for it in iters:
        row = " | ".join(f"{r['psnr_by_iter'].get(it, float('nan')):.2f}"
                         for r in results["runs"])
        print(f"| {it} | {row} |")


if __name__ == "__main__":
    main()

"""One-command real-dataset pipeline: config -> train -> eval -> JSON.

The day the benchmark data arrives (tools/fetch_data.py), this fills
BASELINE.md's quality table with zero new code:

    python -m egonerf_tpu.tools.real_data_run barbershop

resolves the scene's checked-in config (the flattened equivalent of the
reference's configs/EgoNeRF/omniblender/barbershop/default.txt), trains
the full reference schedule, renders the test split, and writes
docs/results_real_<scene>.json with the labeled mean metrics.  When the
scene directory is absent it prints the fetch instructions and exits 3
without touching the TPU — safe to wire as an opt-in test.

Options:  --iters N (shorten the schedule), --dest DIR (data root).
"""
from __future__ import annotations

import glob
import json
import os
import sys
import time

from .fetch_data import DATASETS, is_present, scene_dir

REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def config_for(scene: str) -> str:
    coll = "omniblender" if DATASETS[scene] == "OmniBlender" else "ricoh"
    path = os.path.join(REPO, "configs", "egonerf", coll, f"{scene}.txt")
    if not os.path.exists(path):
        raise SystemExit(f"no config for scene {scene!r} at {path}")
    return path


def main(argv=None):
    argv = list(sys.argv[1:] if argv is None else argv)
    iters = None
    dest = "data"
    if "--iters" in argv:
        i = argv.index("--iters")
        iters = int(argv[i + 1])
        del argv[i:i + 2]
    if "--dest" in argv:
        i = argv.index("--dest")
        dest = argv[i + 1]
        del argv[i:i + 2]
    scene = argv[0] if argv else "barbershop"

    if not is_present(scene, dest):
        print(f"{scene_dir(scene, dest)} absent — run "
              f"`python -m egonerf_tpu.tools.fetch_data {scene}` first.")
        return 3

    from ..train.config import load_config
    from ..train.trainer import Trainer

    overrides = {"datadir": scene_dir(scene, dest), "render_test": True}
    if iters is not None:
        overrides["n_iters"] = iters
    cfg = load_config(config_for(scene), overrides=overrides)

    t0 = time.time()
    trainer = Trainer(cfg)
    psnrs = trainer.train()
    wall = time.time() - t0

    # the TEST-split means are the benchmark number; with render_train on,
    # imgs_train_all/mean.json also exists and a bare glob could win
    cands = (glob.glob(os.path.join(trainer.logdir, "imgs_test_all", "mean.json"))
             or glob.glob(os.path.join(trainer.logdir, "*", "mean.json")))
    metrics = json.load(open(cands[-1])) if cands else None

    out = {
        "scene": scene, "collection": DATASETS[scene],
        "config": cfg.config, "n_iters": cfg.n_iters,
        "final_test_psnr": (round(float(sum(psnrs) / len(psnrs)), 3)
                            if psnrs else None),
        "metrics": metrics, "wall_s": round(wall, 1),
        "artifacts": trainer.logdir,
    }
    from . import write_results

    write_results(f"real_{scene}", out)
    print(json.dumps(out, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

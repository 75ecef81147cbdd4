"""Train-time cull quality A/B at production shape.

``train_keep`` drops the coarse-scored-emptiest merged samples from the
fine field during TRAINING — a deviation from the reference's fixed
256-evals/ray step (reference: models/EgoNeRF.py:536-539), so like the
bf16 and device-sampler deviations it must be defended by a
production-shape A/B, not analogy.  Reuses :mod:`sampler_ab`'s protocol
(27e6 voxels, batch 4096, 128+128 samples, 3k iters, same data/seed);
the uncompacted baseline is sampler_ab's device-uniform run (38.71 dB,
docs/results_sampler_ab.json).

Run on the TPU:  python -m egonerf_tpu.tools.cull_ab [keep,keep,...]
Writes docs/results_cull_ab.json and prints the PSNR curves.
"""
from __future__ import annotations

import json
import sys

from . import sampler_ab


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    keeps = [int(k) for k in args[0].split(",")] if args else [192, 128]
    scene = "wall"
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene = a.split("=", 1)[1]

    results = {"protocol": "sampler_ab device-uniform + train_keep",
               "scene": scene,
               "baseline": "device_uniform_with_replacement "
                           "(docs/results_sampler_ab.json)",
               "runs": []}
    if scene != "wall" and 0 not in keeps:
        # the recorded 38.71 dB baseline is wall-scene-only; any other
        # scene needs its own uncompacted baseline in the same record
        keeps = [0] + keeps
    for k in keeps:
        print(f"=== train_keep={k} (scene={scene}) ===", flush=True)
        rec = sampler_ab.run_variant(f"tk{k}_{scene}", "simple", True,
                                     scene=scene, train_keep=k)
        rec["train_keep"] = k
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)

    from . import write_results

    write_results(f"cull_ab_{scene}" if scene != "wall" else "cull_ab",
                  results)


if __name__ == "__main__":
    main()

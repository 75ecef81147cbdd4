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
    full_every = 0
    tau = 0.0
    for a in sys.argv[1:]:
        if a.startswith("--scene="):
            scene = a.split("=", 1)[1]
        elif a.startswith("--full_every="):
            # hybrid cull: every Mth step unculled (train/config.py)
            full_every = int(a.split("=", 1)[1])
        elif a.startswith("--tau="):
            # Gumbel-top-K cull temperature (ops/cull.py:gumbel_perturb)
            tau = float(a.split("=", 1)[1])
    no_baseline = "--no_baseline" in sys.argv[1:]

    results = {"protocol": "sampler_ab device-uniform + train_keep",
               "scene": scene, "train_keep_full_every": full_every,
               "train_cull_tau": tau,
               "baseline": "device_uniform_with_replacement "
                           "(docs/results_sampler_ab.json)",
               "runs": []}
    if scene != "wall" and 0 not in keeps and not no_baseline:
        # the recorded 38.71 dB baseline is wall-scene-only; any other
        # scene needs its own uncompacted baseline in the same record
        # (--no_baseline skips this when a fresh same-numerics keep=0 run
        # is already on record — the rerun would be bit-identical)
        keeps = [0] + keeps
    for k in keeps:
        fe = full_every if k else 0
        kt = tau if k else 0.0
        tag = (f"tk{k}" + (f"fe{fe}" if fe else "")
               + (f"g{kt:g}" if kt else "") + f"_{scene}")
        print(f"=== train_keep={k} full_every={fe} tau={kt:g} "
              f"(scene={scene}) ===", flush=True)
        rec = sampler_ab.run_variant(tag, "simple", True, scene=scene,
                                     train_keep=k, train_keep_full_every=fe,
                                     train_cull_tau=kt)
        rec["train_keep"] = k
        rec["train_keep_full_every"] = fe
        rec["train_cull_tau"] = kt
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)

    from . import write_results

    name = f"cull_ab_{scene}" if scene != "wall" else "cull_ab"
    if full_every:
        name += f"_fe{full_every}"
    if tau:
        name += f"_g{tau:g}"
    write_results(name, results)


if __name__ == "__main__":
    main()

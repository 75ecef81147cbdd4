"""Run-to-run noise band of the production-shape quality A/B.

Every quality decision in BASELINE.md compares 3k-iter PSNRs against a
0.1-0.15 dB band quoted from round-2 A/B scatter.  This tool measures
that band directly: the uncompacted wall-scene baseline (sampler_ab's
device-uniform variant, the comparator of every cull/sampler A/B) reruns
under different RNG seeds — different ray-id draws, pdf jitter and
init — and the 3k-iter PSNR spread IS the honest error bar.

Run on the TPU:  python -m egonerf_tpu.tools.seed_variance [seed,seed,...]
Defaults to seeds 1,2 (seed 0 is the recorded 38.71 dB run).
Writes docs/results_seed_variance.json.
"""
from __future__ import annotations

import json
import sys

from . import sampler_ab


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    seeds = [int(s) for s in args[0].split(",")] if args else [1, 2]

    results = {"protocol": "sampler_ab device-uniform baseline, seed sweep",
               "scene": "wall",
               "seed0_reference_psnr_3k": 38.71,
               "runs": []}
    for s in seeds:
        print(f"=== seed={s} ===", flush=True)
        rec = sampler_ab.run_variant(f"seed{s}_wall", "simple", True,
                                     scene="wall", seed=s)
        rec["seed"] = s
        results["runs"].append(rec)
        print(json.dumps(rec), flush=True)

    finals = [r["psnr_by_iter"].get("3000") or r["psnr_by_iter"].get(3000)
              for r in results["runs"]] + [38.71]
    finals = [f for f in finals if f is not None]
    results["psnr_3k_all_seeds"] = finals
    results["spread_db"] = round(max(finals) - min(finals), 3)

    from . import write_results

    write_results("seed_variance", results)
    print(json.dumps({"psnr_3k_all_seeds": finals,
                      "spread_db": results["spread_db"]}), flush=True)


if __name__ == "__main__":
    main()

"""Multi-seed A/B for the two defaults that rested on single-run evidence.

Round-3 measured the 3k-iter seed-to-seed PSNR band at 2.45 dB
(docs/results_seed_variance.json), which left the sampler-semantics and
bf16-scatter defaults defended only as "equivalent within a wide band".
This driver re-runs the three arms

  * ``device_uniform``  — the default (device uniform sampler, bf16
    scatter VJPs); also the bf16 arm of the dtype question
  * ``host_epoch``      — the reference's epoch-permutation semantics
    (reference: sampler.py:11-16)
  * ``f32_scatter``     — the default sampler with exact f32 scatter VJPs

under N seeds with everything else pinned, and reports PAIRED per-seed
deltas (same-seed arms share data order and init), whose spread is far
tighter than the raw band: the defaults become "equivalent with a
measured CI" rather than "within noise".

Seed 0 reproduces the round-3 single-run A/Bs (docs/results_sampler_ab
.json, docs/results_f32_ab.json).

Run on the TPU:  python -m egonerf_tpu.tools.seed_ab [seeds] [n_iters]
Defaults: seeds "0,1,2" (9 runs, ~2.8 h); pass "1,2" when seed-0 rows
already exist.  Writes docs/results_seed_ab.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

from . import sampler_ab

ARMS = [
    ("device_uniform", dict(method="simple", device_sampling=True)),
    ("host_epoch", dict(method="simple", device_sampling=False)),
    ("f32_scatter", dict(method="simple", device_sampling=True,
                         compute_dtype="float32")),
]


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    seeds = [int(s) for s in (args[0] if args else "0,1,2").split(",")]
    n_iters = int(args[1]) if len(args) > 1 else sampler_ab.N_ITERS
    # EGONERF_DEADLINE_TS: unix ts after which no NEW arm is started (the
    # current arm always finishes cleanly — killing a TPU client wedges
    # the relay tunnel for minutes).  Completed pairs remain valid
    # evidence: the merge-on-write below accumulates across invocations.
    deadline = float(os.environ.get("EGONERF_DEADLINE_TS", "0") or 0)
    est_per_run = 1400.0  # refined from measured runs below

    runs = []
    for seed in seeds:
        for arm, spec in ARMS:
            if deadline and time.time() + est_per_run > deadline:
                print(f"deadline: stopping before {arm}_s{seed} "
                      f"({len(runs)} runs completed this invocation)",
                      flush=True)
                _write(runs, seeds, n_iters)
                return
            name = f"{arm}_s{seed}"
            print(f"=== {name} ===", flush=True)
            t_arm = time.time()
            rec = sampler_ab.run_variant(
                name, spec["method"], spec["device_sampling"],
                **{k: v for k, v in spec.items()
                   if k not in ("method", "device_sampling")},
                seed=seed, n_iters=n_iters,
                vis_list=str([n_iters]))
            rec.update(arm=arm, seed=seed)
            runs.append(rec)
            est_per_run = max(300.0, time.time() - t_arm)
            print(json.dumps(rec), flush=True)
            _write(runs, seeds, n_iters)  # incremental: resumable evidence

    all_runs = _write(runs, seeds, n_iters)
    final = {r["seed"]: {} for r in all_runs}
    for r in all_runs:
        by_iter = r["psnr_by_iter"]
        final[r["seed"]][r["arm"]] = by_iter.get(n_iters,
                                                 by_iter.get(str(n_iters)))
    print("\n| seed | " + " | ".join(a for a, _ in ARMS)
          + " | d(host-uniform) | d(f32-bf16) |")
    print("|---" * (len(ARMS) + 3) + "|")
    for seed in seeds:
        row = final.get(seed, {})
        vals = [row.get(a) for a, _ in ARMS]
        if all(v is not None for v in vals):
            du, dh, df = vals
            print(f"| {seed} | {du:.2f} | {dh:.2f} | {df:.2f} "
                  f"| {dh - du:+.2f} | {df - du:+.2f} |")


def _write(runs, seeds, n_iters):
    """Merge this invocation's runs into docs/results_seed_ab.json.

    Keyed by (arm, seed): re-runs replace, prior invocations' completed
    pairs persist — the deadline stop and a later resume compose."""
    from . import results_path, write_results

    path = results_path("seed_ab")
    merged = {}
    if os.path.exists(path):
        try:
            with open(path) as f:
                for r in json.load(f).get("runs", []):
                    merged[(r["arm"], r["seed"])] = r
        except (json.JSONDecodeError, KeyError):
            pass
    for r in runs:
        merged[(r["arm"], r["seed"])] = r
    all_runs = sorted(merged.values(),
                      key=lambda r: (r["seed"], r["arm"]))
    write_results("seed_ab", {
        "seeds": sorted({r["seed"] for r in all_runs}), "n_iters": n_iters,
        "paired": "same-seed arms share data order and init",
        "runs": all_runs,
    })
    return all_runs


if __name__ == "__main__":
    main()

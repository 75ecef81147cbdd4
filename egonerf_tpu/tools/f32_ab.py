"""bf16-vs-f32 gradient-scatter quality A/B at production shape.

Re-runs :mod:`sampler_ab`'s device-uniform variant with
``compute_dtype=float32`` (exact f32 scatter VJPs in ops/vm_lookup.py
instead of the default bf16 fast path) so the bf16 default is defended at
full scale, not by the round-1 600-iter smoke.  Measured (3k iters, 27e6
voxels, one v5e): bf16 38.71 dB vs f32 38.57 dB held-out — quality-neutral
— while bf16 runs ~27% faster (19.5k vs 14.2k rays/s).

Run on the TPU:  python -m egonerf_tpu.tools.f32_ab
Writes docs/results_f32_ab.json.
"""
from __future__ import annotations

import json
import os

from . import sampler_ab


def main():
    orig = sampler_ab.make_config

    def patched(name, method, device_sampling):
        cfg = orig(name, method, device_sampling)
        cfg.compute_dtype = "float32"
        return cfg

    sampler_ab.make_config = patched
    try:
        rec = sampler_ab.run_variant("device_uniform_f32", "simple", True)
    finally:
        sampler_ab.make_config = orig
    print(json.dumps(rec), flush=True)
    out = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..",
                                       "docs", "results_f32_ab.json"))
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()

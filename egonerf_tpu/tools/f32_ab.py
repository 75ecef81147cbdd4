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

from . import sampler_ab


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    rec = sampler_ab.run_variant("device_uniform_f32", "simple", True,
                                 compute_dtype="float32")
    print(json.dumps(rec), flush=True)
    from . import write_results

    write_results("f32_ab", rec)


if __name__ == "__main__":
    main()

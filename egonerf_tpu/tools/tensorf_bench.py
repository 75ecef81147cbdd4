"""TensoRF-family training throughput at an LLFF-like shape (VERDICT r2
weak #3 / next-step #5): the cost of the static-shape value-gating
deviation, measured rather than assumed.

The reference's TensoRF path culls work dynamically: `ray_valid` /
`app_mask` shrink the sample set evaluated by the MLP as the alpha mask
converges (reference: models/tensorBase.py:464-487), roughly an order of
magnitude at convergence.  This framework keeps static shapes (XLA) and
gates *values* instead, so its step cost is CONSTANT over training.  This
tool measures that constant with bench.py's segment methodology (async
call batches, one sync per segment, median-of-segments) and also reports
the converged gate occupancy — the fraction of samples the reference
would have skipped — so the deviation's cost is an explicit number in
BASELINE.md instead of a hand-wave.

Run on the TPU:  python -m egonerf_tpu.tools.tensorf_bench
Prints one JSON line; writes docs/results_tensorf_bench.json.
"""
from __future__ import annotations

import contextlib
import io
import json
import statistics
import time

# long enough for the density field to localize and the alpha mask to
# bake (update at 1000), so gate_occupancy is a converged-ish number
WARMUP_ITERS = 1200
STEPS_PER_CALL = 8
CALLS_PER_SEG = 3
N_SEGMENTS = 3
BATCH = 4096
N_SAMPLES = 256          # matches tools/quality_run's tensorf preset
N_VOXEL = 16_777_216     # 256^3 — the quality run's final grid


def main():
    from . import require_tpu_relay

    require_tpu_relay()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..data.datasets import SyntheticEgoDataset
    from ..presets import production_overrides
    from ..train.config import load_config
    from ..train.trainer import Trainer

    dev = jax.devices()[0]
    result = {"metric": "tensorf_train_rays_per_sec", "unit": "rays/s",
              "platform": dev.platform,
              "device": getattr(dev, "device_kind", str(dev))}

    cfg = load_config(overrides=production_overrides(
        model_name="TensorVMSplit", coordinates_name="xyz",
        exp_sampling=False, interval_th=False, resampling=False,
        use_coarse_sample=False, n_coarse=N_SAMPLES, batch_size=BATCH,
        N_voxel_init=N_VOXEL, N_voxel_final=N_VOXEL,
        near_far="[0.05, 8.5]", n_iters=WARMUP_ITERS,
        update_AlphaMask_list="[1000]", L1_weight_initial=8e-5,
        L1_weight_rest=4e-5,
        steps_per_call=STEPS_PER_CALL, progress_refresh_rate=400,
        basedir="/tmp/egonerf_tensorf_bench", expname="tb", N_vis=0,
        vis_list="[1000000000]", i_weights=10**9,
    ))
    import shutil

    shutil.rmtree("/tmp/egonerf_tensorf_bench/tb", ignore_errors=True)

    log = io.StringIO()
    with contextlib.redirect_stdout(log):
        trainer = Trainer(cfg)
        ds = dict(n_train=8, n_test=1, height=400, width=800,
                  near_far=cfg.near_far)
        trainer.set_datasets(
            SyntheticEgoDataset(split="train", is_stack=False, **ds),
            SyntheticEgoDataset(split="test", is_stack=True, **ds))
        trainer.train()

        step_fn = trainer._get_step(1, n_steps=STEPS_PER_CALL,
                                    l1_w=cfg.L1_weight_initial)
        step0, key = trainer._device_counters(
            WARMUP_ITERS, jax.random.PRNGKey(cfg.seed + 3))

        def run_calls(n_calls):
            nonlocal step0, key
            t_seg = time.perf_counter()
            for _ in range(n_calls):
                (trainer.params, trainer.opt_state, key, step0,
                 mses) = trainer._run_step(step_fn, None, key, step0)
            float(mses[-1])
            return time.perf_counter() - t_seg

        run_calls(1)
        seg_rates = [BATCH * STEPS_PER_CALL * CALLS_PER_SEG / run_calls(CALLS_PER_SEG)
                     for _ in range(N_SEGMENTS)]

        # gate occupancy: what fraction of the BATCH x N_SAMPLES grid the
        # reference's dynamic app_mask would actually evaluate
        # (weight > rayMarch_weight_thres, tensorBase.py:480)
        rays = trainer.train_dataset.all_rays[:BATCH]
        out = trainer.model.forward(
            trainer.params, jnp.asarray(np.asarray(rays, np.float32)),
            key=None, is_train=False, n_coarse=N_SAMPLES)
        alpha = np.asarray(out["alpha"], np.float32)
        trans = np.cumprod(np.concatenate(
            [np.ones_like(alpha[:, :1]), 1.0 - alpha + 1e-10], axis=-1),
            axis=-1)[:, :-1]
        w = alpha * trans
        occupancy = float((w > cfg.rm_weight_mask_thre).mean())

    value = statistics.median(seg_rates)
    result.update(
        value=round(value, 1),
        step_ms_p50=round(1000.0 * BATCH / value, 1),
        segments_rays_per_sec=[round(r, 1) for r in seg_rates],
        n_samples=N_SAMPLES, n_voxel=N_VOXEL, batch=BATCH,
        gate_occupancy=occupancy,
        note=("static-shape step cost is constant over training; "
              "gate_occupancy is the fraction the reference would evaluate "
              "after alpha-mask convergence"),
    )
    from . import write_results

    write_results("tensorf_bench", result)
    print(json.dumps(result))


if __name__ == "__main__":
    main()

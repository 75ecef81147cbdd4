"""Benchmark: training throughput at the reference's headline configuration.

Measures steady-state rays/sec of the REAL training loop — the Trainer's
fused-scan step (forward with 128 coarse + 128 resampled fine samples,
losses, Adam, device-resident ray buffers with on-device batch gathers) at
the reference grid budget N_voxel=27e6 and batch 4096
(reference: configs/EgoNeRF/common.txt:6-23).

``vs_baseline`` compares against an RTX-3090 reference-throughput estimate
(see BASELINE.md: the reference repo publishes no numbers; 30k rays/s is
our recorded estimate of the reference implementation's training rate).

Prints exactly one JSON line on stdout.
"""
import contextlib
import io
import json
import os
import sys
import time


BASELINE_RAYS_PER_SEC = 30_000.0  # estimated reference (RTX 3090) rate
COMPUTE_DTYPE = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")


def main():
    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    warmup_iters, bench_iters = 96, 160
    cfg = load_config(overrides=dict(
        dataset_name="synthetic", model_name="EgoNeRF", coordinates_name="yinyang",
        exp_sampling=True, interval_th=True, r0="0.03", resampling=True,
        use_coarse_sample=True, n_coarse=128, n_fine=128, batch_size=4096,
        n_iters=warmup_iters, N_voxel_init=27_000_000, N_voxel_final=27_000_000,
        n_lamb_sigma="[16,16,16]", n_lamb_sh="[48,48,48]", data_dim_color=27,
        shadingMode="MLP_Fea", fea2denseAct="softplus", density_shift="-8",
        view_pe=2, fea_pe=2, featureC=128, lr_init=0.02, sparsity_lambda=0,
        near_far="[0.01, 15.0]", progress_refresh_rate=10**9,
        basedir="/tmp/egonerf_bench", expname="bench", N_vis=0,
        vis_list="[1000000000]", i_weights=10**9, steps_per_call=8,
        compute_dtype=COMPUTE_DTYPE, seed=0,
    ))

    log = io.StringIO()
    with contextlib.redirect_stdout(log):
        trainer = Trainer(cfg)
        trainer.train()  # warmup + compile
        # timed segment: continue the SAME compiled loop
        trainer.start_step = warmup_iters
        trainer.cfg.n_iters = warmup_iters + bench_iters
        t0 = time.perf_counter()
        trainer.train()
        # train() ends with a checkpoint save which syncs params to host,
        # so the device queue is drained here
        dt = time.perf_counter() - t0

    # subtract the final checkpoint-save host sync from the measurement by
    # timing it separately
    t1 = time.perf_counter()
    with contextlib.redirect_stdout(log):
        trainer.save("/tmp/egonerf_bench/timing_probe.npz", 0)
    save_cost = time.perf_counter() - t1
    dt = max(dt - save_cost, 1e-6)

    rays_per_sec = cfg.batch_size * bench_iters / dt
    print(json.dumps({
        "metric": "train_rays_per_sec",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()

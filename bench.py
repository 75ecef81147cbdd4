"""Benchmark: training throughput at the reference's headline configuration.

Measures steady-state rays/sec of the REAL compiled training step — the
Trainer's fused-scan multi-step (forward with 128 coarse + 128 resampled
fine samples, all losses, Adam, in-step ray-id sampling from device-resident
buffers, in-step schedule weights) at the reference grid budget
N_voxel=27e6 and batch 4096 (reference: configs/EgoNeRF/common.txt:6-23).

Robustness (the host has ONE cpu core and reaches the TPU through a
tunnel, so concurrent host load can starve the dispatch path):
  * the process raises its own scheduling priority,
  * the executing JAX platform/device is asserted and recorded,
  * the timed region is split into independent segments with calls issued
    back-to-back (async) and ONE sync per segment; the headline value is
    the median segment rate,
  * a separate per-call-synced segment records the step-latency
    distribution (p50/p95),
  * a result below the sanity floor or with high segment spread is
    flagged in the output instead of silently recorded.

``vs_baseline`` compares against an RTX-3090 reference-throughput estimate
(see BASELINE.md for the derivation; the reference repo publishes no
throughput numbers).

Deadline guard (round-5, VERDICT r4 #1a): the driver runs this under a
hard ``timeout`` (~50 min observed; round 4's capture died rc=124 after a
4-hour quality run held the chip flock through the window).  The bench now
budgets itself from process start against ``$BENCH_DEADLINE_S`` (default
2400 s, deliberately inside the driver's observed budget): the relay/lock
waits are capped so the train measurement always gets its slice, lock
waiting requests a cooperative *yield* from any long-running chip holder
(tools.request_tpu_yield — Trainer checkpoints and exits resumable),
trailing segments are dropped when the clock runs short, and the
production-scale eval block runs only when its compile+measure still fits.
The train headline therefore ALWAYS prints one JSON line.
"""
import contextlib
import io
import json
import os
import statistics
import sys
import time

from egonerf_tpu.presets import production_overrides  # light import, no jax

BASELINE_RAYS_PER_SEC = 30_000.0  # estimated reference (RTX 3090) rate
COMPUTE_DTYPE = os.environ.get("BENCH_COMPUTE_DTYPE", "bfloat16")
# train-time top-K cull (ops/cull.py).  The headline follows the
# production preset's default (flipping that default is gated on the
# pre-registered A/B protocol, NOTES.md); the env var is the ablation
# toggle, and any nonzero value is recorded in the output so a culled
# run can never pass as an unculled one.
TRAIN_KEEP = int(os.environ.get("BENCH_TRAIN_KEEP",
                                production_overrides()["train_keep"]))
TRAIN_KEEP_FULL_EVERY = int(os.environ.get(
    "BENCH_TRAIN_KEEP_FULL_EVERY",
    production_overrides()["train_keep_full_every"]))
TRAIN_CULL_TAU = float(os.environ.get(
    "BENCH_TRAIN_CULL_TAU", production_overrides()["train_cull_tau"]))
SANITY_FLOOR = 9_000.0  # rays/s; below this the host/TPU was degraded

WARMUP_ITERS = 96
STEPS_PER_CALL = int(os.environ.get("BENCH_STEPS_PER_CALL", 48))
CALLS_PER_SEG = 5
N_SEGMENTS = 4
if os.environ.get("BENCH_QUICK"):  # ablation mode: faster, slightly noisier
    WARMUP_ITERS, CALLS_PER_SEG, N_SEGMENTS = 32, 3, 2

# -- self-imposed wall-clock budget, counted from process start (see module
# docstring).  TRAIN_NEED_S reserves the train measurement's slice (step
# compile 2-5 min + warmup + 4 segments + synced latency pass, measured
# ~8-9 min round 4); EVAL_NEED_S is the production eval block's slice
# (whole-image render compile + 2 timed renders, ~7 min round 4).
DEADLINE_S = float(os.environ.get("BENCH_DEADLINE_S", 2400))
_T0 = time.monotonic()
TRAIN_NEED_S = 720.0
EVAL_NEED_S = 600.0


def _remaining() -> float:
    return DEADLINE_S - (time.monotonic() - _T0)


def main():
    result = {"metric": "train_rays_per_sec", "unit": "rays/s"}
    try:
        os.nice(-10)  # measure the TPU, not host scheduling luck
    except OSError:
        pass
    load0 = os.getloadavg()[0]

    # Fail *bounded* (instead of hanging in device init) when the axon TPU
    # relay is unreachable — a dead relay blocks clients in init at zero
    # CPU, but outages have also ended on their own, so poll for up to
    # BENCH_RELAY_WAIT_S (default 10 min) before declaring the run
    # unbenchmarkable (shared guard: egonerf_tpu/tools/relay_ready).
    from egonerf_tpu.tools import acquire_tpu_lock, relay_ready

    relay_wait = min(float(os.environ.get("BENCH_RELAY_WAIT_S", 600)),
                     max(60.0, _remaining() - TRAIN_NEED_S))
    relay_err = relay_ready(relay_wait)
    if relay_err:
        result.update(value=0.0, vs_baseline=0.0,
                      error=f"{relay_err}; not benchmarkable from this process")
        print(json.dumps(result))
        return
    # serialize against any experiment driver holding the chip — a bench
    # overlapped with another TPU job measures queueing, not the step.
    # The poll loop touches the yield file, so a long-running holder
    # (quality_run / seed_ab via Trainer.train) checkpoints and exits
    # resumable within ~one fused chunk instead of starving this capture.
    lock_wait = min(float(os.environ.get("TPU_LOCK_WAIT_S", 3600)),
                    max(0.0, _remaining() - TRAIN_NEED_S))
    if not acquire_tpu_lock(lock_wait, preempt=True):
        result["warning_lock"] = ("chip lock busy past the deadline-capped "
                                  "wait; another TPU process may be running")

    import jax

    from egonerf_tpu.tools import enable_compilation_cache
    enable_compilation_cache()  # repo-local persistent cache: warm compiles
    dev = jax.devices()[0]
    result["platform"] = dev.platform
    result["device"] = getattr(dev, "device_kind", str(dev))
    if dev.platform == "cpu":
        result.update(value=0.0, vs_baseline=0.0,
                      error="executing on CPU, not a TPU backend")
        print(json.dumps(result))
        return

    from egonerf_tpu.train.config import load_config
    from egonerf_tpu.train.trainer import Trainer

    cfg = load_config(overrides=production_overrides(
        n_iters=WARMUP_ITERS, progress_refresh_rate=10**9,
        basedir="/tmp/egonerf_bench", expname="bench", N_vis=0,
        vis_list="[1000000000]", steps_per_call=STEPS_PER_CALL,
        compute_dtype=COMPUTE_DTYPE, train_keep=TRAIN_KEEP,
        train_keep_full_every=TRAIN_KEEP_FULL_EVERY,
        train_cull_tau=TRAIN_CULL_TAU,
    ))
    if TRAIN_KEEP:
        result["train_keep"] = TRAIN_KEEP
        if TRAIN_KEEP_FULL_EVERY:
            result["train_keep_full_every"] = TRAIN_KEEP_FULL_EVERY
        if TRAIN_CULL_TAU:
            result["train_cull_tau"] = TRAIN_CULL_TAU

    log = io.StringIO()
    with contextlib.redirect_stdout(log):
        trainer = Trainer(cfg)
        trainer.train()  # warmup + compile of the fused 8-step program

        # drive the SAME compiled multi-step the trainer just ran
        step_fn = trainer._get_step(1, n_steps=STEPS_PER_CALL,
                                    l1_w=cfg.L1_weight_initial)
        step0, key = trainer._device_counters(
            WARMUP_ITERS, jax.random.PRNGKey(cfg.seed + 3))

        def run_calls(n_calls, sync_each=False):
            nonlocal step0, key
            per_call = []
            t_seg = time.perf_counter()
            for _ in range(n_calls):
                t0 = time.perf_counter()
                (trainer.params, trainer.opt_state, key, step0,
                 mses) = trainer._run_step(step_fn, None, key, step0)
                if sync_each:
                    float(mses[-1])
                    per_call.append(time.perf_counter() - t0)
            float(mses[-1])  # drain the device queue
            return time.perf_counter() - t_seg, per_call

        run_calls(1)  # settle after warmup's tail chunks

        seg_rates = []
        for i in range(N_SEGMENTS):
            # a segment is ~35 s; keep at least two, drop the rest when the
            # deadline looms so the headline still prints
            if i >= 2 and _remaining() < 120:
                result["warning_segments_truncated"] = (
                    f"deadline: measured {i}/{N_SEGMENTS} segments")
                break
            dt, _ = run_calls(CALLS_PER_SEG)
            seg_rates.append(cfg.batch_size * STEPS_PER_CALL * CALLS_PER_SEG / dt)

        # per-call latency distribution (each call synced)
        if _remaining() < 90:
            per_call = []
            result["warning_latency_skipped"] = "deadline"
        else:
            _, per_call = run_calls(CALLS_PER_SEG, sync_each=True)

        # -- eval headline: full-fidelity 2000x1000 render from the just-
        # trained params (the reference prints per-image eval time as a
        # first-class signal, reference: renderer.py:68,75).  Skipped in
        # BENCH_QUICK ablation mode to keep toggles fast, and when the
        # remaining deadline budget can't fit its compile (VERDICT r4 #1a —
        # the train headline must never be hostage to this block).
        eval_metrics = {}
        if not os.environ.get("BENCH_QUICK") and _remaining() < EVAL_NEED_S:
            eval_metrics = {"eval_skipped":
                            f"deadline ({_remaining():.0f}s left < "
                            f"{EVAL_NEED_S:.0f}s eval budget)"}
        elif not os.environ.get("BENCH_QUICK"):
            try:
                from egonerf_tpu.data.datasets import SyntheticEgoDataset
                from egonerf_tpu.render.renderer import Renderer

                eval_ds = SyntheticEgoDataset(
                    split="test", is_stack=True, n_train=2, n_test=1,
                    height=1000, width=2000, near_far=cfg.near_far)
                renderer = Renderer.from_config(trainer.model, cfg,
                                                eval_ds.white_bg)
                renderer.set_directions(eval_ds.directions)
                pose = eval_ds.poses[0]
                renderer.render_view(trainer.params, pose)  # compile + warm
                times = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    renderer.render_view(trainer.params, pose)
                    times.append(time.perf_counter() - t0)
                n_eval_rays = 2000 * 1000
                eval_metrics = {
                    "eval_sec_per_image": round(min(times), 2),
                    "eval_rays_per_sec": round(n_eval_rays / min(times), 1),
                    "eval_image": "2000x1000",
                }
            except Exception as e:  # never let eval eat the train headline
                eval_metrics = {"eval_error": f"{type(e).__name__}: {e}"[:300]}

    value = statistics.median(seg_rates)
    step_ms = sorted(1000.0 * t / STEPS_PER_CALL for t in per_call)
    # schema-stable even when the latency pass was deadline-skipped: every
    # prior round's capture had these keys, so fixed-schema consumers get
    # nulls rather than KeyErrors
    latency_metrics = dict(step_ms_p50=None, step_ms_p95=None, step_ms_max=None)
    if step_ms:
        latency_metrics = dict(
            step_ms_p50=round(step_ms[len(step_ms) // 2], 1),
            # true 95th-percentile index; with few samples this is near-max,
            # so the sample max is reported separately and honestly
            step_ms_p95=round(step_ms[min(int(0.95 * (len(step_ms) - 1) + 0.5),
                                          len(step_ms) - 1)], 1),
            step_ms_max=round(step_ms[-1], 1),
        )
    result.update(
        value=round(value, 1),
        vs_baseline=round(value / BASELINE_RAYS_PER_SEC, 3),
        segments_rays_per_sec=[round(r, 1) for r in seg_rates],
        load_avg_start=round(load0, 2),
        load_avg_end=round(os.getloadavg()[0], 2),
        **latency_metrics,
        **eval_metrics,
    )
    spread = max(seg_rates) / max(min(seg_rates), 1e-9)
    if spread > 1.3:
        result["warning_unstable"] = f"segment spread {spread:.2f}x"
    if value < SANITY_FLOOR:
        result["warning_degraded"] = (
            f"below sanity floor {SANITY_FLOOR:.0f} rays/s — host or TPU was "
            f"contended during this run (see load_avg)")
    print(json.dumps(result))


if __name__ == "__main__":
    main()

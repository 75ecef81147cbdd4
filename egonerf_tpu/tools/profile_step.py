"""Capture + summarize a device-op time breakdown of the production train
step (the evidence tool behind step-cost tables in BASELINE.md).

Runs the real trainer at the reference headline shape with
``cfg.profile_dir`` set (the trainer traces 24 steady-state iterations,
train/trainer.py:550-558), then parses the XSpace protobuf the jax
profiler wrote and aggregates per-op device time over one fused chunk.

Run on the TPU:  python -m egonerf_tpu.tools.profile_step
Prints a table of top ops by total device-time share.
"""
from __future__ import annotations

import glob
import os
import sys
from collections import defaultdict

PROFILE_DIR = "/tmp/egonerf_profile"
# warmup (16) + at least one full steady-state fused chunk inside the
# trace window, at the default steps_per_call=48
N_ITERS = 160


def capture():
    from ..data.datasets import SyntheticEgoDataset
    from ..train.config import load_config
    from ..train.trainer import Trainer

    from ..presets import production_overrides

    # PROFILE_TRAIN_KEEP traces the compacted step (ops/cull.py) so the
    # culled program gets the same per-op roofline accounting the full
    # step has (see BASELINE.md tables)
    train_keep = int(os.environ.get("PROFILE_TRAIN_KEEP", 0))
    cfg = load_config(overrides=production_overrides(
        n_iters=N_ITERS, progress_refresh_rate=16,
        basedir="/tmp/egonerf_profile_run", expname="profile", N_vis=0,
        profile_dir=PROFILE_DIR, train_keep=train_keep,
    ))
    if train_keep:
        print(f"profiling the train_keep={train_keep} compacted step")
    # fresh run, always: a completed checkpoint in the profile logdir
    # would auto-resume at n_iters and trace nothing
    logdir = os.path.join(cfg.basedir, cfg.expname)
    if os.path.isdir(logdir):
        import shutil

        shutil.rmtree(logdir)
    trainer = Trainer(cfg)
    common = dict(n_train=4, n_test=1, height=500, width=1000,
                  near_far=cfg.near_far)
    trainer.set_datasets(
        SyntheticEgoDataset(split="train", is_stack=False, **common),
        SyntheticEgoDataset(split="test", is_stack=True, **common))
    trainer.train()


def summarize(profile_dir: str = PROFILE_DIR, top: int = 40):
    """Aggregate device-plane op durations from the newest xplane dump."""
    try:  # proto location moved across TF releases; gate cleanly
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except ModuleNotFoundError:
        from tensorflow.core.profiler.protobuf import xplane_pb2

    paths = sorted(glob.glob(os.path.join(
        profile_dir, "plugins/profile/*/*.xplane.pb")), key=os.path.getmtime)
    if not paths:
        print(f"no xplane dumps under {profile_dir}", file=sys.stderr)
        return None
    space = xplane_pb2.XSpace()
    with open(paths[-1], "rb") as f:
        space.ParseFromString(f.read())

    import re

    rows = []
    for plane in space.planes:
        is_device = ("TPU" in plane.name or "/device" in plane.name.lower()
                     ) and "host" not in plane.name.lower()
        if not is_device:
            continue
        metadata = {m.id: m.name for m in plane.event_metadata.values()}
        per_op = defaultdict(float)
        n_events = 0
        for line in plane.lines:
            for ev in line.events:
                name = metadata.get(ev.metadata_id, str(ev.metadata_id))
                per_op[name] += ev.duration_ps / 1e9  # -> ms
                n_events += 1
        if not per_op:
            continue
        # drop wrapper/aggregate rows (jit entry, while loop, bare lane ids)
        # that nest the real ops and would double-count, then group HLO ops
        # by their output-signature so the hundreds of small per-step
        # fusions aggregate into readable clusters
        per_sig = defaultdict(float)
        for name, ms in per_op.items():
            if name.startswith("jit_") or name.isdigit() or "while" in name[:20]:
                continue
            m = re.match(r"%?([a-z_\-]+)[.\d]* = (\(?\w+\[[\d,]*\])", name)
            sig = f"{m.group(1)} -> {m.group(2)}" if m else name[:60]
            per_sig[sig] += ms
        total = sum(per_sig.values())
        # the trainer records how many steps the trace actually covered
        # (chunking rounds its window up to whole fused chunks)
        try:
            with open(os.path.join(profile_dir, "traced_steps.json")) as f:
                import json

                n_steps = json.load(f)["steps"]
        except (OSError, KeyError, ValueError):
            from ..train.trainer import PROFILE_TRACE_ITERS as n_steps
        print(f"\n=== plane: {plane.name} ({n_events} events, "
              f"{total:.1f} ms real-op total across {n_steps} steps) ===")
        print(f"{'op signature':72s} {'ms/step':>8s} {'share':>7s}")
        for sig, ms in sorted(per_sig.items(), key=lambda kv: -kv[1])[:top]:
            print(f"{sig[:72]:72s} {ms / n_steps:8.2f} {100 * ms / total:6.1f}%")
        rows.append((plane.name, per_sig, total))
    return rows


def main():
    # a bare directory argument means "summarize that dump" — capturing
    # (which needs the TPU) only happens with no args at all, so the relay
    # guard runs only on the capture path
    dirs = [a for a in sys.argv[1:] if not a.startswith("-")]
    if dirs:
        summarize(dirs[0])
        return
    if "--summarize-only" not in sys.argv:
        from . import require_tpu_relay

        require_tpu_relay()
        capture()
    summarize()


if __name__ == "__main__":
    main()

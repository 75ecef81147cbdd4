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


def capture_eval(height: int = 1000, width: int = 2000, n_images: int = 2):
    """Trace the forward-only eval path (render_view) at the production
    image shape — the renderer's scan-of-chunks program
    (render/renderer.py:121-156; the reference prints per-image eval time
    as a first-class signal, reference: renderer.py:68,75).  Weights are
    random-init: throughput is shape-bound, not value-bound."""
    import jax
    import numpy as np

    from ..data.datasets import SyntheticEgoDataset
    from ..presets import production_overrides
    from ..render.renderer import Renderer
    from ..train.config import load_config
    from ..train.trainer import Trainer

    cfg = load_config(overrides=production_overrides(
        n_iters=1, basedir="/tmp/egonerf_profile_eval_run", expname="profile",
        N_vis=0))
    trainer = Trainer(cfg)
    common = dict(n_train=2, n_test=1, height=height, width=width,
                  near_far=cfg.near_far)
    trainer.set_datasets(
        SyntheticEgoDataset(split="train", is_stack=False, **common),
        SyntheticEgoDataset(split="test", is_stack=True, **common))
    test_ds = trainer.test_dataset
    renderer = Renderer.from_config(
        trainer.model, cfg, test_ds.white_bg,
        chunk=int(os.environ.get("PROFILE_EVAL_CHUNK", cfg.eval_chunk)))
    renderer.set_directions(test_ds.directions)
    pose = test_ds.poses[0]
    import time

    out = renderer.render_view(trainer.params, pose)  # compile + warm
    eval_dir = PROFILE_DIR + "_eval"
    times = []
    with jax.profiler.trace(eval_dir):
        for _ in range(n_images):
            t0 = time.perf_counter()
            out = renderer.render_view(trainer.params, pose)
            times.append(time.perf_counter() - t0)
    n_rays = height * width
    print(f"eval trace: {n_images} x {width}x{height} images, "
          f"best {min(times):.2f}s/image = {n_rays / min(times):,.0f} rays/s"
          f" (np outputs force the transfer)")
    import json

    with open(os.path.join(eval_dir, "traced_steps.json"), "w") as f:
        json.dump({"steps": n_images, "sec_per_image": min(times),
                   "rays_per_sec": n_rays / min(times)}, f)
    return eval_dir


# ---------------------------------------------------------------------------
# 100%-of-the-step family accounting.  The device "XLA Ops" line tiles the
# whole timeline with leaf ops (union == span, measured), so bucketing every
# leaf into a named family and summing reproduces the full step cost —
# nothing asserted flat, everything itemized (round-3 verdict ask #1).
# Families are keyed on tensor shapes at the production config: 4096 rays x
# 256 merged samples = 1048576 flat fine samples, 4096 x 128 = 524288 coarse
# samples, fine plane tables {154800, 177504, 51600} x 256 packed rows,
# line tables {300, 344, 1032} x 64, param-space tensors lead (2, 516, ...).
# ---------------------------------------------------------------------------
_FAMILY_RULES = (
    # (family, regex over "opcode out_signature") — first match wins.
    # out_signature is the "= type[shape]" part of the HLO one-liner, so
    # rules key on what an op PRODUCES; the raw line is matched as a
    # fallback for input-keyed families.
    ("plane grad scatter", r"= bf16\[(?:154800|177504|51600),256\]"),
    ("scatter index sort", r"^sort = \(s32\[1048576\]"),
    ("plane gather+expand", r"= bf16\[1048576,256\]"),
    ("fine combine + line dots", r"\[1048576,(?:64|48|16)\]|= \S+\[(?:300|344|1032),64\]"),
    ("coarse pass (half-res)", r"\[524288[,\]]|= \S+\[(?:38700|44376|12900),128\]"),
    ("derive-coarse pooling", r"\[2,516,(?:150|172)|\[2,(?:258|516),(?:75|86)"),
    ("shader MLP + PE", r"\[4096,256,(?:150|144|128|54|27|3)[,\]]|\[1048576,(?:144|27)\]|= \S+\[(?:150|128|144),(?:128|3)\]|^convolution"),
    ("per-ray sample math", r"\[4096,(?:256|255|129|128|64|3|2|1)[,\]]|\[4096\]"),
    ("param-space (Adam, regs)", r"\[2,(?:516|150|172|144),|\[(?:1000,2000|2000,1000)|= \S+\[(?:516|258)"),
)


def families(profile_dir: str = PROFILE_DIR, write: bool = True,
             name: str = "profile_families"):
    """Bucket every leaf op on the device timeline into a named family;
    the table sums to the full measured step."""
    import re
    from collections import Counter

    space = _load_xspace(profile_dir)
    if space is None:
        return None
    plane = next((p for p in space.planes if p.name.endswith("TPU:0")), None)
    if plane is None:
        print("no TPU device plane in trace", file=sys.stderr)
        return None
    md = {m.id: m.name for m in plane.event_metadata.values()}
    line = next((l for l in plane.lines if l.name == "XLA Ops"), None)
    if line is None:
        print("no 'XLA Ops' line in the TPU plane (sparse capture or "
              "unexpected runtime version)", file=sys.stderr)
        return None
    n_steps = _traced_steps(profile_dir)
    per_fam, examples = Counter(), {}
    span = 0.0
    for ev in line.events:
        # NB: do not call this `name` — it would shadow the artifact-name
        # parameter and write_results() below would use an HLO op string
        # as the filename (happened once; the artifact had to be salvaged)
        op_name = md.get(ev.metadata_id, "?")
        dur = ev.duration_ps / 1e9
        span = max(span, (ev.offset_ps + ev.duration_ps) / 1e9)
        if dur > 50.0 * n_steps:  # the whole-module wrapper event
            continue
        m = re.match(r"%?([a-z_\-]+)[.\d]* (= \S+?\[[\d,]*\])", op_name)
        key = f"{m.group(1)} {m.group(2)}" if m else op_name[:80]
        # rules see ONLY the opcode + output signature — matching the full
        # line would key on the op's *inputs* (a gather READS a plane
        # table; only the scatter WRITES one)
        fam = "other small tail"
        for f, pat in _FAMILY_RULES:
            if re.search(pat, key):
                fam = f
                break
        per_fam[fam] += dur
        ex = examples.setdefault(fam, Counter())
        ex[op_name.split(" = ")[-1][:48]] += dur
    total = sum(per_fam.values())
    print(f"\n=== family accounting: {total / n_steps:.1f} ms/step over "
          f"{n_steps} steps (device timeline tiles fully: union==span) ===")
    print(f"{'family':28s} {'ms/step':>8s} {'share':>7s}  top signature")
    rows = []
    for fam, ms in per_fam.most_common():
        top_sig = examples[fam].most_common(1)[0][0]
        print(f"{fam:28s} {ms / n_steps:8.2f} {100 * ms / total:6.1f}%  {top_sig}")
        rows.append({"family": fam, "ms_per_step": round(ms / n_steps, 2),
                     "share_pct": round(100 * ms / total, 1),
                     # top op signatures INSIDE the family (ms/step) so the
                     # next attack target is readable from the JSON alone
                     "top_ops": [{"sig": sig, "ms_per_step": round(d / n_steps, 2)}
                                 for sig, d in examples[fam].most_common(5)]})
    rec = {"ms_per_step_total": round(total / n_steps, 2),
           "n_steps": n_steps, "families": rows}
    if write:
        from . import write_results

        write_results(name, rec)
    return rec


def _load_xspace(profile_dir: str):
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
    return space


def _traced_steps(profile_dir: str) -> int:
    try:
        import json

        with open(os.path.join(profile_dir, "traced_steps.json")) as f:
            return json.load(f)["steps"]
    except (OSError, KeyError, ValueError):
        from ..train.trainer import PROFILE_TRACE_ITERS

        return PROFILE_TRACE_ITERS


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
        families(dirs[0], write=False)
        return
    if "--eval" in sys.argv:
        from . import require_tpu_relay

        require_tpu_relay()
        eval_dir = capture_eval()
        summarize(eval_dir)
        # published as its own artifact so the eval residual is itemized,
        # not asserted (VERDICT r4 #4)
        families(eval_dir, name="profile_eval_families")
        return
    if "--summarize-only" not in sys.argv:
        from . import require_tpu_relay

        require_tpu_relay()
        capture()
    summarize()
    families()


if __name__ == "__main__":
    main()

"""Offline / experiment tooling (sweeps, converters, benchmark drivers)."""
from __future__ import annotations


def results_path(name: str) -> str:
    """The repo's ``docs/results_<name>.json`` — ONE definition, shared by
    writers (``write_results``) and readers (e.g. seed_ab's merge-on-write
    resume, which must read the same file it writes).

    ``name`` must be a short identifier: a caller bug once passed a
    full HLO op string (a shadowed variable in profile_step.families)
    and littered docs/ with an unparseable filename — fail loudly
    instead."""
    import os
    import re

    if not re.fullmatch(r"[A-Za-z0-9_.-]{1,80}", name):
        raise ValueError(f"results name must be a short slug, got {name!r}")
    return os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..",
                                        "docs", f"results_{name}.json"))


def write_results(name: str, obj) -> str:
    """Write ``obj`` to :func:`results_path`; returns the written path.

    Shared by every experiment driver so the results location has one
    definition.
    """
    import json

    path = results_path(name)
    with open(path, "w") as f:
        json.dump(obj, f, indent=1)
    return path


def relay_ready(wait_s: float | None = None) -> str | None:
    """Poll the axon TPU relay; ``None`` once reachable, else the last
    connection error after a bounded wait.

    A dead relay makes JAX clients hang in device init at zero CPU
    (observed twice mid-round — NOTES.md operational record), but outages
    have also ended on their own, so every entry point polls for a
    bounded window (default ``$TPU_RELAY_WAIT_S`` or 600 s) instead of
    dying on the first refused connect.  Shared by bench.py,
    __graft_entry__.py and every experiment driver.  No-op (returns None
    immediately) on non-axon platforms."""
    import os
    import socket
    import time

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return None
    if wait_s is None:
        wait_s = float(os.environ.get("TPU_RELAY_WAIT_S", 600))
    deadline = time.monotonic() + wait_s
    while True:
        probe = socket.socket()
        probe.settimeout(3)
        try:
            probe.connect(("127.0.0.1", 8082))
            return None
        except OSError as e:
            if time.monotonic() >= deadline:
                return ("axon TPU relay unreachable on 127.0.0.1:8082 "
                        f"({e}) after waiting up to {wait_s:.0f}s")
        finally:
            probe.close()
        time.sleep(15)


def enable_compilation_cache() -> str | None:
    """Point JAX's persistent compilation cache at a repo-local directory
    and return its path (``None`` when disabled via ``$JAX_CACHE_DISABLE``).

    Production-scale compiles cost 2-30 min per fresh process (NOTES.md);
    the persistent cache collapses repeats to seconds and — verified on the
    axon TPU backend, 2.75 s → 0.64 s across processes — works through the
    relay.  The directory lives INSIDE the repo (gitignored) so it survives
    container restarts: the driver's official ``bench.py`` capture then
    compiles warm even in a fresh container, which is the round-4
    starvation fix's last soft spot (VERDICT r4 #1a).

    Call after ``import jax`` and before first device use.  Safe to call
    multiple times and on CPU (tests share the cache dir; entries are keyed
    by backend + topology so TPU/CPU never collide).
    """
    import os

    if os.environ.get("JAX_CACHE_DISABLE"):
        return None
    import jax

    path = os.environ.get(
        "JAX_CACHE_DIR",
        os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..",
                                     ".jax_cache")))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        # cache every compile that costs >=1 s regardless of entry size —
        # the default min-size gate would skip mid-sized programs that
        # still pay multi-second XLA runs through the tunnel
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None  # an older jax without these flags just compiles cold
    return path


_TPU_LOCK_FD = None  # held for the life of the process once acquired


def yield_path() -> str:
    """The chip-yield request file (``$TPU_YIELD_PATH``; beside the lock).

    Round-4 postmortem (VERDICT r4 #1): a 4-hour quality run held the chip
    flock through the driver's bench window and the official capture timed
    out empty.  The fix is cooperative: *preempting* lock waiters (the
    bench capture — ``acquire_tpu_lock(preempt=True)``) touch this file
    (:func:`request_tpu_yield`) and long-running lock *holders* poll it at
    chunk boundaries (:func:`tpu_yield_requested`; Trainer.train
    checkpoints and exits resumable) — so no long job can starve a capture
    again, while ordinary experiment drivers still queue politely."""
    import os

    return os.environ.get("TPU_YIELD_PATH", "/tmp/egonerf_tpu.yield")


def request_tpu_yield() -> None:
    """Ask the current chip holder to yield: touch the yield file (mtime is
    the request's freshness; stale files are ignored, see
    :func:`tpu_yield_requested`)."""
    import os

    path = yield_path()
    try:
        with open(path, "a"):
            os.utime(path, None)
    except OSError:
        pass  # an unwritable /tmp just degrades to the old wait behavior


def tpu_yield_requested(max_age_s: float = 120.0) -> bool:
    """True when a chip waiter touched the yield file recently.

    Freshness-gated so an abandoned request file (e.g. a waiter that was
    killed) cannot keep interrupting future runs: waiters re-touch every
    poll interval (10 s), so a live request is always < ``max_age_s`` old."""
    import os
    import time

    try:
        return (time.time() - os.path.getmtime(yield_path())) < max_age_s
    except OSError:
        return False


def clear_tpu_yield() -> None:
    """Remove the yield file (called by a waiter once it acquires the lock;
    any *other* still-waiting process re-touches it within one poll)."""
    import contextlib
    import os

    with contextlib.suppress(OSError):
        os.remove(yield_path())


def holds_tpu_lock() -> bool:
    """True when THIS process currently holds the chip flock."""
    return _TPU_LOCK_FD is not None


def acquire_tpu_lock(wait_s: float | None = None, preempt: bool = False) -> bool:
    """Serialize chip users via an exclusive flock on ``/tmp/egonerf_tpu.lock``.

    Only ONE process can use the TPU productively (the chip sits behind a
    single host-mediated tunnel), so every TPU entry point — bench.py and
    each experiment driver — takes this lock before touching JAX and holds
    it until process exit (the kernel releases flocks automatically, so a
    crashed holder never wedges the queue).  Polls for up to
    ``$TPU_LOCK_WAIT_S`` (default 3600 s); on timeout it returns False and
    the caller proceeds anyway — accepting contention beats deadlocking an
    unattended driver.  No-op (True) on non-axon platforms.  The lock path
    is overridable via ``$TPU_LOCK_PATH`` so tests never touch (or trip
    over) the real chip lock a live experiment queue may hold.

    ``preempt=True`` additionally requests a cooperative *yield* from the
    current holder on every failed attempt (:func:`request_tpu_yield`) —
    reserved for the official bench capture, which must never be starved
    by an hours-class run (VERDICT r4 #1b).  Experiment drivers entering
    through :func:`require_tpu_relay` queue politely instead: letting any
    short tool preempt a 4-hour quality run would trade one starvation
    problem for another (and two auto-restarting yieldable drivers would
    mutually preempt, each paying the multi-minute recompile per chunk).
    """
    global _TPU_LOCK_FD
    import fcntl
    import os
    import time

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return True
    if _TPU_LOCK_FD is not None:
        return True
    if wait_s is None:
        wait_s = float(os.environ.get("TPU_LOCK_WAIT_S", 3600))
    path = os.environ.get("TPU_LOCK_PATH", "/tmp/egonerf_tpu.lock")
    fd = os.open(path, os.O_CREAT | os.O_RDWR, 0o666)
    deadline = time.monotonic() + wait_s
    while True:
        try:
            fcntl.flock(fd, fcntl.LOCK_EX | fcntl.LOCK_NB)
            _TPU_LOCK_FD = fd  # keep the fd open = keep the lock
            # clear any pending yield request so it can't instantly yield
            # THIS run; a still-waiting process re-touches within one poll
            clear_tpu_yield()
            return True
        except OSError:
            if preempt:
                # ask the holder to checkpoint + exit resumable (VERDICT r4
                # #1b) — on every failed attempt, so even a deadline-capped
                # waiter leaves the request behind for the holder's next
                # chunk check
                request_tpu_yield()
            if time.monotonic() >= deadline:
                os.close(fd)
                return False
            time.sleep(min(10.0, max(0.1, deadline - time.monotonic())))


def require_tpu_relay() -> None:
    """SystemExit with a clear error when the relay stays down past the
    bounded poll (see :func:`relay_ready`); once the relay answers, also
    take the chip lock (:func:`acquire_tpu_lock`) so sequential experiment
    drivers never overlap on the single TPU.

    Also marks this process *yieldable* (``$TPU_YIELDABLE=1``): every long
    experiment driver enters through here, and Trainer.train checkpoints +
    exits resumable when a lock waiter (e.g. the driver's official bench
    capture) requests the chip.  bench.py deliberately does NOT come
    through here, so the capture itself can never be yanked mid-run."""
    import os

    err = relay_ready()
    if err:
        raise SystemExit(
            f"{err}; this tool needs the TPU — re-run when the relay returns")
    acquire_tpu_lock()
    os.environ.setdefault("TPU_YIELDABLE", "1")
    enable_compilation_cache()

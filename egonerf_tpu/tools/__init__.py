"""Offline / experiment tooling (sweeps, converters, benchmark drivers)."""
from __future__ import annotations


def results_path(name: str) -> str:
    """The repo's ``docs/results_<name>.json`` — ONE definition, shared by
    writers (``write_results``) and readers (e.g. seed_ab's merge-on-write
    resume, which must read the same file it writes)."""
    import os

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


_TPU_LOCK_FD = None  # held for the life of the process once acquired


def acquire_tpu_lock(wait_s: float | None = None) -> bool:
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
            return True
        except OSError:
            if time.monotonic() >= deadline:
                os.close(fd)
                return False
            time.sleep(10)


def require_tpu_relay() -> None:
    """SystemExit with a clear error when the relay stays down past the
    bounded poll (see :func:`relay_ready`); once the relay answers, also
    take the chip lock (:func:`acquire_tpu_lock`) so sequential experiment
    drivers never overlap on the single TPU."""
    err = relay_ready()
    if err:
        raise SystemExit(
            f"{err}; this tool needs the TPU — re-run when the relay returns")
    acquire_tpu_lock()

"""Offline / experiment tooling (sweeps, converters, benchmark drivers)."""
from __future__ import annotations


def write_results(name: str, obj) -> str:
    """Write ``obj`` to the repo's ``docs/results_<name>.json``.

    Shared by every experiment driver so the results location has one
    definition; returns the written path.
    """
    import json
    import os

    path = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..",
                                        "docs", f"results_{name}.json"))
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


def require_tpu_relay() -> None:
    """SystemExit with a clear error when the relay stays down past the
    bounded poll (see :func:`relay_ready`)."""
    err = relay_ready()
    if err:
        raise SystemExit(
            f"{err}; this tool needs the TPU — re-run when the relay returns")

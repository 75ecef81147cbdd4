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


def require_tpu_relay() -> None:
    """Fail fast with a clear error instead of hanging in device init when
    the axon TPU relay is dead (observed twice mid-round: clients freeze at
    zero CPU — NOTES.md operational record; same guard as bench.py and
    __graft_entry__.py).  No-op on non-axon platforms."""
    import os

    if os.environ.get("JAX_PLATFORMS", "") != "axon":
        return
    import socket

    probe = socket.socket()
    probe.settimeout(3)
    try:
        probe.connect(("127.0.0.1", 8082))
    except OSError as e:
        raise SystemExit(
            f"axon TPU relay unreachable on 127.0.0.1:8082 ({e}); "
            "this tool needs the TPU — re-run when the relay returns")
    finally:
        probe.close()

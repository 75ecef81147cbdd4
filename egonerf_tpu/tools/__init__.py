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

"""Depth control for heavy fuzz families (round-3 item 7).

The default (shallow) depth keeps ``pytest -q`` inside the documented wall
budget; ``QUBLAS_TEST_DEPTH=full`` restores the full randomized sweeps for
pre-commit / CI runs.  Shallow trials are a strict prefix of the full set
(same seeds), so a failure found at full depth reproduces by exporting the
env var — never by editing counts.
"""

import os

FULL = os.environ.get("QUBLAS_TEST_DEPTH", "").lower() == "full"


def trials(full: int, shallow: int) -> int:
    """Trial count for a randomized family."""
    return full if FULL else shallow


def pick(full_list, shallow_list):
    """Parametrization list for a grid family."""
    return full_list if FULL else shallow_list

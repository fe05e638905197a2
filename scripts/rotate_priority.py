"""Compute the mechanical PRIORITY window (stalest-first re-verification).

Round-11 era: every oracle-backed query has at least one driver
hash-green row (CORRECTNESS_r01..r10), so the window's job changed from
"first score" to "re-verification": fill the driver's 50 hash-checked
slots with the queries whose most recent hash-green round is OLDEST —
the ones with the most code churn since they were last gate-checked.
Never-scored names (new queries land with no history) sort first
(last_green = -1), so additions always enter the gate before any
re-verification slot.

Deterministic: key = (last_hash_green_round, name). The same
computation lives in tests/test_registry.py::test_rotation_queue_is_mechanical;
this script exists to print the list for pasting into
cirro_annotation_spark/registry.py after each driver scoring round.

Usage: python scripts/rotate_priority.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def last_green_rounds(repo: str = REPO) -> dict[str, int]:
    """name -> most recent round with a driver hash-green row."""
    out: dict[str, int] = {}
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"_r(\d+)\.json$", path).group(1))
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and row.get("hash_match"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def stalest_window(size: int = 50) -> list[str]:
    from cirro_annotation_spark import registry

    registry.load_all_suites()
    green = last_green_rounds()
    candidates = [n for n in registry.QUERIES if n in registry.ORACLES]
    ranked = sorted(candidates, key=lambda n: (green.get(n, -1), n))
    return ranked[:size]


if __name__ == "__main__":
    green = last_green_rounds()
    window = stalest_window()
    print("PRIORITY: list[str] = [")
    for n in window:
        print(f'    "{n}",  # last green r{green.get(n, -1)}')
    print("]")

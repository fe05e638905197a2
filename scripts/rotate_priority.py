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


def last_green_rounds(
    repo: str = REPO, driver_only: bool = False
) -> dict[str, int]:
    """name -> most recent round with a hash-green row.

    Two ledger sources (VERDICT r13 item 3): the driver's round-close
    CORRECTNESS_r{N}.json AND the session sweep's mid-round
    CORRECTNESS_r{N}b.json (written by
    ``check_correctness.py --write-artifact``). With ``driver_only``
    the artifact files are excluded — that ledger tie-breaks the
    window so the driver's own 50 slots keep cycling stalest-DRIVER-
    first even in rounds where the session artifact marks all 350
    fresh.
    """
    out: dict[str, int] = {}
    pat = r"_r(\d+)\.json$" if driver_only else r"_r(\d+)b?\.json$"
    for path in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json")):
        m = re.search(pat, path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and row.get("hash_match"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def stalest_window(size: int = 50) -> list[str]:
    from cirro_annotation_spark import registry

    registry.load_all_suites()
    green = last_green_rounds()
    green_driver = last_green_rounds(driver_only=True)
    candidates = [n for n in registry.QUERIES if n in registry.ORACLES]
    ranked = sorted(
        candidates,
        key=lambda n: (green.get(n, -1), green_driver.get(n, -1), n),
    )
    return ranked[:size]


if __name__ == "__main__":
    green = last_green_rounds()
    green_driver = last_green_rounds(driver_only=True)
    window = stalest_window()
    print("PRIORITY: list[str] = [")
    for n in window:
        tag = f"driver r{green_driver.get(n, -1)}"
        if green.get(n, -1) != green_driver.get(n, -1):
            tag += f", artifact r{green.get(n, -1)}"
        print(f'    "{n}",  # last green {tag}')
    print("]")

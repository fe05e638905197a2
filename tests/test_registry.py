"""Driver-window canary (round-3 advice / VERDICT items 6, r10 item 1).

The driver hash-checks exactly the FIRST 50 entries of queries().
``registry.PRIORITY`` fills that window. Round-11 era semantics
(VERDICT r10 item 1): every oracle-backed query has at least one driver
hash-green row, so the window is a STALEST-FIRST RE-VERIFICATION queue —
the 50 oracle-backed queries whose most recent hash-green round is
oldest, tie-broken by name. Never-scored names (new queries) sort first
(last_green = -1) so additions always enter the gate ahead of any
re-verification slot. These assertions regenerate the window from
CORRECTNESS_r*.json history and demand exact equality — no
hand-maintained membership.
"""

from __future__ import annotations

import glob
import json
import os
import re

from cirro_annotation_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_WINDOW = 50


def _loaded() -> None:
    registry.load_all_suites()


def _last_green(driver_only: bool = False) -> dict[str, int]:
    """name -> most recent round with a hash-green row — from the
    driver's CORRECTNESS_r{N}.json AND the session's mid-round
    CORRECTNESS_r{N}b.json artifacts (VERDICT r13 item 3), unless
    ``driver_only``. Mirrors scripts/rotate_priority.py."""
    out: dict[str, int] = {}
    pat = r"_r(\d+)\.json$" if driver_only else r"_r(\d+)b?\.json$"
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        m = re.search(pat, path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, row in json.load(open(path)).items():
            if isinstance(row, dict) and row.get("hash_match"):
                out[name] = max(out.get(name, 0), rnd)
    return out


def _driver_scored() -> set[str]:
    """Every query name with a DRIVER CORRECTNESS row in any past round.

    Driver files only (`_r(\\d+).json`) — the session-written
    CORRECTNESS_r{N}b.json artifacts must not count here, or a family
    only ever checked by the session sweep would read as driver-covered
    (the round-2 gate-blindness class this guard exists for)."""
    scored: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        if not re.search(r"_r(\d+)\.json$", path):
            continue
        scored.update(json.load(open(path)).keys())
    return scored


def _stalest_window() -> list[str]:
    """The mechanical window: stalest-scored oracle-backed names first.

    Mirrors scripts/rotate_priority.py — key = (last_green_any_round,
    last_green_driver_round, name), never-scored = -1 so new queries
    always claim slots first; the driver-only ledger tie-breaks so the
    driver's 50 slots keep cycling stalest-driver-first even when a
    session artifact marks all 350 fresh.
    """
    green = _last_green()
    green_driver = _last_green(driver_only=True)
    candidates = [n for n in registry.QUERIES if n in registry.ORACLES]
    ranked = sorted(
        candidates,
        key=lambda n: (green.get(n, -1), green_driver.get(n, -1), n),
    )
    return ranked[:_WINDOW]


def test_priority_is_exactly_the_driver_window() -> None:
    """The window must be FULL (there are ≥50 oracle-backed queries —
    295 as of r10 — so re-verification always has candidates) and free
    of duplicates."""
    _loaded()
    n_candidates = sum(1 for n in registry.QUERIES if n in registry.ORACLES)
    expected_len = min(_WINDOW, n_candidates)
    assert len(registry.PRIORITY) == expected_len, (
        f"PRIORITY must fill the driver's {_WINDOW}-query hash-checked "
        f"window ({n_candidates} oracle-backed candidates exist), got "
        f"{len(registry.PRIORITY)} names"
    )
    assert len(set(registry.PRIORITY)) == len(registry.PRIORITY), (
        "duplicate names in PRIORITY"
    )


def test_priority_names_all_registered_and_first() -> None:
    _loaded()
    missing = [n for n in registry.PRIORITY if n not in registry.QUERIES]
    assert not missing, f"PRIORITY names not registered: {missing}"
    ordered = list(registry.ordered_queries())
    assert ordered[: len(registry.PRIORITY)] == registry.PRIORITY


def test_every_suite_family_is_driver_covered() -> None:
    """Every suite family must have at least one query that is either in
    the current hash-checked window or already driver-green in a past
    CORRECTNESS round. (Round 2's regression was families with NEITHER —
    never gate-checked at all. In the re-verification era this is almost
    vacuous — everything has been scored — but it still guards a NEW
    family landing entirely rows-only and outside the window.)"""
    _loaded()
    scored = _driver_scored()
    suite_prefix = "cirro_annotation_spark.suites."
    all_families = {
        fn.__module__[len(suite_prefix):]
        for fn in registry.QUERIES.values()
        if fn.__module__.startswith(suite_prefix)
    }
    covered = {
        registry.QUERIES[n].__module__[len(suite_prefix):]
        for n in registry.QUERIES
        if n in scored or n in registry.PRIORITY
    }
    left_out = all_families - covered
    assert not left_out, (
        f"suite families with ZERO queries either driver-scored or inside "
        f"the {_WINDOW}-query window (round-2 gate-blindness): {left_out}"
    )


def test_rotation_queue_is_mechanical() -> None:
    """VERDICT r10 item 1: the window IS the computed stalest-first
    list — exact equality, order included, against the regeneration from
    CORRECTNESS history. Two properties fall out for free:

    * New queries (never hash-scored, last_green = -1) sort ahead of
      every re-verification slot, so an addition that is NOT reflected
      in PRIORITY turns this red — the round-2 gate-blindness class.
    * Committing a freshly generated CORRECTNESS_r{N}.json bumps the
      last_green round of exactly the just-scored window, which changes
      the computed stalest set — red by design until the SAME commit
      rotates PRIORITY (ADVICE r7 atomic-commit requirement). Run
      scripts/rotate_priority.py and paste.
    """
    _loaded()
    if not _last_green():  # fresh checkout without CORRECTNESS files
        return
    expected = _stalest_window()
    assert registry.PRIORITY == expected, (
        "PRIORITY drifted from the mechanical stalest-first window; "
        "run scripts/rotate_priority.py and paste its output.\n"
        f"missing from PRIORITY: "
        f"{[n for n in expected if n not in registry.PRIORITY]}\n"
        f"stale in PRIORITY: "
        f"{[n for n in registry.PRIORITY if n not in expected]}"
    )


def test_never_scored_queries_never_wait_outside_the_window() -> None:
    """A brand-new oracle-backed query must be IN the window (it cannot
    be hash-checked from outside it). With the stalest-first key this is
    implied by test_rotation_queue_is_mechanical, but this spells the
    invariant out so a future re-keying cannot silently drop it —
    unless additions in one round outnumber the window itself."""
    _loaded()
    green = _last_green()
    if not green:
        return
    never = [
        n for n in registry.QUERIES
        if n in registry.ORACLES and n not in green
    ]
    if len(never) >= _WINDOW:
        return  # window physically cannot hold them all
    outside = [n for n in never if n not in registry.PRIORITY]
    assert not outside, (
        f"never-hash-scored queries queued outside the window: {outside}"
    )


def test_window_entries_are_all_oracle_backed() -> None:
    """The window exists to maximize hash-checked coverage; rows-only
    entries can never convert a slot into a hash-green row, so the
    mechanical window contains none."""
    _loaded()
    rows_only = [n for n in registry.PRIORITY if n not in registry.ORACLES]
    assert not rows_only, (
        f"rows-only queries occupy hash-checkable window slots: {rows_only}"
    )


def test_registered_name_matches_function_name():
    """Every @query("name") must decorate the function named `name` —
    a decorator accidentally stacked onto the NEXT def registers the
    wrong callable under the name (round-5 near-miss: an inserted query
    block landed between dedup_cluster_assign's decorator and its def,
    silently rebinding that scored name to the new function; only the
    full-sweep oracle diff caught it)."""
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    mismatched = {
        name: fn.__name__
        for name, fn in QUERIES.items()
        if fn.__name__ != name
    }
    assert not mismatched, mismatched

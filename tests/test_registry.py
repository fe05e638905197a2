"""Driver-window canary (round-3 advice / VERDICT item 6).

The driver hash-checks exactly the FIRST 50 entries of queries().
``registry.PRIORITY`` is built to fill that window with oracle-backed
representatives of every suite family; these assertions make any
regression of that invariant (a 51st name sliding a family out, a
rename, a family losing all its in-window reps) a loud pytest failure
instead of a silent correctness-gate blind spot.
"""

from __future__ import annotations

import glob
import json
import os

from cirro_annotation_spark import registry

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _loaded() -> None:
    registry.load_all_suites()


def _driver_scored() -> set[str]:
    """Every query name with a driver CORRECTNESS row in any past round."""
    scored: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        scored.update(json.load(open(path)).keys())
    return scored


def _driver_hash_scored() -> set[str]:
    """Names whose driver history already banked the strongest check they
    can ever earn: a hash-green row, or any row for a rows-only-by-design
    query (no oracle registered — rows is all the driver can record).
    A row written BEFORE the query's oracle existed (err=no_oracle, e.g.
    sim_topk_lsh in r1) does NOT count: that slot can still convert to
    hash-green, so the rotation must re-queue it."""
    hash_green: set[str] = set()
    any_row: set[str] = set()
    for path in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        for name, row in json.load(open(path)).items():
            any_row.add(name)
            if isinstance(row, dict) and row.get("hash_match"):
                hash_green.add(name)
    rows_only_by_design = {n for n in any_row if n not in registry.ORACLES}
    return hash_green | rows_only_by_design


def test_priority_is_exactly_the_driver_window() -> None:
    """PRIORITY fills the driver's 50-query hash-checked window. It may
    hold FEWER than 50 names only when the never-hash-scored remainder
    itself is smaller than 50 — you cannot fill slots without eligible
    candidates (round-8 state: 38 remain). In that state the window must
    contain the ENTIRE remainder; new queries must be appended until the
    window is full again."""
    _loaded()
    assert len(registry.PRIORITY) <= 50, (
        f"PRIORITY must fit the driver's 50-query hash-checked window, "
        f"got {len(registry.PRIORITY)} names"
    )
    assert len(set(registry.PRIORITY)) == len(registry.PRIORITY), (
        "duplicate names in PRIORITY"
    )
    if len(registry.PRIORITY) < 50:
        scored = _driver_hash_scored()
        remainder = {
            n
            for n in registry.QUERIES
            if n not in scored and n in registry.ORACLES
        }
        left_out = remainder - set(registry.PRIORITY)
        assert not left_out, (
            f"window has {50 - len(registry.PRIORITY)} free slots but "
            f"never-hash-scored queries are queued outside it: "
            f"{sorted(left_out)}"
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
    never gate-checked at all. Once a family is fully driver-scored it
    may legitimately rotate out of the window.)"""
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
        f"the 50-query window (round-2 gate-blindness): {left_out}"
    )


def test_rotation_queue_is_mechanical() -> None:
    """VERDICT r6 item 4: generate the rotation invariant from
    CORRECTNESS history instead of hand-bookkeeping (the r6 verdict
    caught a 73-vs-74 comment drift). The current PRIORITY window must
    (a) contain NO query the driver has already hash-scored — a repeat
    wastes a window slot that a never-scored query needs; and (b) be
    drawn entirely from the oracle-backed set, since rows-only entries
    can never convert a slot into a hash-green row.

    NOTE (atomic-commit requirement, ADVICE r7): committing a freshly
    generated CORRECTNESS_r{N}.json turns this test red by design — it
    scores exactly the current window. The scoring artifact must land in
    the SAME commit as the next rotation of PRIORITY (and the plan-set
    update in test_rotation_remainder_matches_plan), never alone."""
    _loaded()
    scored = _driver_hash_scored()
    if not scored:  # fresh checkout without CORRECTNESS files
        return
    repeats = [n for n in registry.PRIORITY if n in scored]
    assert not repeats, (
        f"PRIORITY repeats already-driver-scored queries "
        f"(wasted window slots): {repeats}"
    )
    rows_only = [n for n in registry.PRIORITY if n not in registry.ORACLES]
    assert not rows_only, (
        f"PRIORITY window slots spent on rows-only queries: {rows_only}"
    )


def test_rotation_remainder_matches_plan() -> None:
    """The next-round remainder (names queued BEHIND the window) must
    equal the mechanically-computed set: (registered ∖ hash-scored ∖
    window ∖ rows-only). Keeps the written plan in lock-step with
    reality. Round-9 state: the window holds the 8 r8-overflow names
    (8 < 50), so the queue is EMPTY until round-9 additions overflow
    the 50-slot window — any overflow name must be listed here."""
    _loaded()
    scored = _driver_hash_scored()
    if not scored:
        return
    remainder = sorted(
        n
        for n in registry.QUERIES
        if n not in scored
        and n not in registry.PRIORITY
        and n in registry.ORACLES
    )
    # Names queued for the NEXT rotation (overflow past the 50 slots).
    planned: set[str] = set()
    # EQUALITY, both directions (round-7 review): a superset check let
    # stale names rot in the planned list — the exact drift class this
    # test exists to catch.
    assert planned == set(remainder), (
        f"plan missing: {sorted(set(remainder) - planned)}; "
        f"stale in plan: {sorted(planned - set(remainder))}"
    )


def test_window_entries_are_overwhelmingly_oracle_backed() -> None:
    """The window exists to maximize hash-checked coverage; keep the
    rows-only count inside it at most the irreducible set (seeded-hash /
    HLL / iterative interiors, justified in COVERAGE.md)."""
    _loaded()
    rows_only = [n for n in registry.PRIORITY if n not in registry.ORACLES]
    assert len(rows_only) <= 4, (
        f"too many rows-only queries occupy hash-checkable window slots: "
        f"{rows_only}"
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

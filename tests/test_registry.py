"""Driver-window canary (round-3 advice / VERDICT item 6).

The driver hash-checks exactly the FIRST 50 entries of queries().
``registry.PRIORITY`` is built to fill that window with oracle-backed
representatives of every suite family; these assertions make any
regression of that invariant (a 51st name sliding a family out, a
rename, a family losing all its in-window reps) a loud pytest failure
instead of a silent correctness-gate blind spot.
"""

from __future__ import annotations

from cirro_annotation_spark import registry


def _loaded() -> None:
    registry.load_all_suites()


def test_priority_is_exactly_the_driver_window() -> None:
    _loaded()
    assert len(registry.PRIORITY) == 50, (
        f"PRIORITY must be exactly the driver's 50-query hash-checked "
        f"window, got {len(registry.PRIORITY)} names"
    )
    assert len(set(registry.PRIORITY)) == 50, "duplicate names in PRIORITY"


def test_priority_names_all_registered_and_first() -> None:
    _loaded()
    missing = [n for n in registry.PRIORITY if n not in registry.QUERIES]
    assert not missing, f"PRIORITY names not registered: {missing}"
    ordered = list(registry.ordered_queries())
    assert ordered[: len(registry.PRIORITY)] == registry.PRIORITY


def test_every_suite_family_has_a_window_representative() -> None:
    _loaded()
    suite_prefix = "cirro_annotation_spark.suites."
    all_families = {
        fn.__module__[len(suite_prefix):]
        for fn in registry.QUERIES.values()
        if fn.__module__.startswith(suite_prefix)
    }
    in_window = {
        registry.QUERIES[n].__module__[len(suite_prefix):]
        for n in registry.PRIORITY
    }
    left_out = all_families - in_window
    assert not left_out, (
        f"suite families with ZERO queries inside the driver's 50-query "
        f"window (the round-2 gate-blindness regression): {left_out}"
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

"""Per-query physical-plan fingerprints — the committed plan-shape gate.

VERDICT r13 item 2: wall-time cannot police plan regressions (two
same-HEAD bench runs differed by 11%), so every registered query gets a
committed structural fingerprint of its physical plan — counts of the
scale-relevant node kinds (shuffles, broadcasts, scans, sorts, windows,
joins, aggregates, Python boundaries) parsed from ``explain("formatted")``
at sf0.01 — and pytest diffs HEAD's fingerprints against the committed
file. A deliberate plan change must update PLAN_FINGERPRINTS.json in the
same commit; an accidental one (a filter that stops pushing, a broadcast
that silently becomes a sort-merge join, a new Exchange) turns the gate
red no matter what the bench noise says.

Deliberately EXCLUDED from the fingerprint: Project / Filter /
ColumnarToRow / InputAdapter / ReusedExchange / AQEShuffleRead node
counts (refactor churn without scale meaning), codegen ids (annotated
only post-execution), and anything from the node DETAIL sections (paths,
statistics, expression ids — all run-dependent). What remains is exactly
the plan shape a 100 TB review reads first.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from . import physical_plan, pushed_filter_scan_count, read_schema_cols

# Node-kind prefixes that carry scale meaning. A header is attributed to
# the FIRST prefix that matches, so e.g. "BroadcastExchange" is counted
# before the bare "Exchange" test can see it, and "Scan parquet" /
# "Scan ExistingRDD" / "Scan json" all fold into "Scan".
_SIGNIFICANT: tuple[tuple[str, str], ...] = (
    ("BroadcastExchange", "BroadcastExchange"),
    ("Exchange", "Exchange"),
    ("Scan ", "Scan"),
    ("LocalTableScan", "LocalTableScan"),
    ("BroadcastHashJoin", "BroadcastHashJoin"),
    ("BroadcastNestedLoopJoin", "BroadcastNestedLoopJoin"),
    ("SortMergeJoin", "SortMergeJoin"),
    ("ShuffledHashJoin", "ShuffledHashJoin"),
    ("CartesianProduct", "CartesianProduct"),
    ("HashAggregate", "HashAggregate"),
    ("ObjectHashAggregate", "ObjectHashAggregate"),
    ("SortAggregate", "SortAggregate"),
    ("WindowGroupLimit", "WindowGroupLimit"),
    ("Window", "Window"),
    ("Sort", "Sort"),
    ("Expand", "Expand"),
    ("Generate", "Generate"),
    ("Union", "Union"),
    ("TakeOrderedAndProject", "TakeOrderedAndProject"),
    ("GlobalLimit", "GlobalLimit"),
    ("ArrowEvalPython", "ArrowEvalPython"),
    ("FlatMapGroupsInPandas", "FlatMapGroupsInPandas"),
    ("MapInPandas", "MapInPandas"),
    ("FlatMapGroupsWithStateInPandas", "FlatMapGroupsWithStateInPandas"),
    ("BatchEvalPython", "BatchEvalPython"),  # row-at-a-time UDF: must stay 0
)

_HEADER = re.compile(r"^\(\d+\)\s+(.*?)\s*(?:\[codegen id : \d+\])?\s*$",
                     re.MULTILINE)


def plan_fingerprint(df: DataFrame) -> dict[str, int]:
    """Counts of significant node kinds in the pre-execution physical
    plan (the initial AdaptiveSparkPlan rendering — exchange nodes appear
    exactly once there; the final adaptive rendering repeats them per
    materialized stage). Also records ``pushed_filters`` (number of scans
    with a non-empty PushedFilters list) and ``scan_cols`` (total columns
    across all parquet ReadSchema lines) — the pushdown/pruning axes a
    node count can't see.
    """
    plan = physical_plan(df)
    counts: dict[str, int] = {}
    for header in _HEADER.findall(plan):
        for prefix, label in _SIGNIFICANT:
            if header.startswith(prefix):
                counts[label] = counts.get(label, 0) + 1
                break
    counts["pushed_filters"] = pushed_filter_scan_count(plan)
    counts["scan_cols"] = len(read_schema_cols(plan))
    return dict(sorted(counts.items()))


def diff_fingerprints(
    committed: dict[str, dict[str, int]],
    current: dict[str, dict[str, int]],
) -> list[str]:
    """Human-readable drift lines; empty means the gate is green.

    Queries only on one side are reported too — a new query must land
    with its fingerprint, and a deleted one must leave the file.
    """
    out: list[str] = []
    for name in sorted(set(committed) | set(current)):
        if name not in committed:
            out.append(f"{name}: NEW query with no committed fingerprint")
            continue
        if name not in current:
            out.append(f"{name}: committed fingerprint but query is gone")
            continue
        a, b = committed[name], current[name]
        if a == b:
            continue
        keys = sorted(set(a) | set(b))
        delta = ", ".join(
            f"{k}: {a.get(k, 0)} -> {b.get(k, 0)}"
            for k in keys
            if a.get(k, 0) != b.get(k, 0)
        )
        out.append(f"{name}: {delta}")
    return out

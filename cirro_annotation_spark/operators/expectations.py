"""Declarative data-quality expectations evaluated in ONE scan — the
published Deequ / Great Expectations shape re-expressed as a single
Spark aggregation.

Reference parity note: the reference (CirroBio/Cirro-Annotation) has no
data-quality layer; this belongs to the large-scale-pipeline extension
surface (a 100 TB ingest without machine-checkable expectations ships
silent schema drift downstream).

Design: every rule compiles to a conditional-count EXPRESSION inside one
``df.agg(...)`` — so a 20-rule suite still costs exactly one pass over
the data and one constant-size (1-row) aggregate, map-side combined.
The per-rule report rows come from a ``stack`` unpivot of that single
row (the profile_lineitem discipline). Uniqueness rules ride in the
same aggregate via count_distinct (Spark plans the distinct with an
Expand, still one scan).

No UDFs anywhere — every predicate is a codegen'd column expression.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Rule = dict  # {"rule": str, "col": str, "kind": "predicate"|"unique", "pred": Column}


def not_null(col: str) -> Rule:
    return {"rule": "not_null", "col": col, "kind": "predicate",
            "pred": F.col(col).isNull()}


def unique(col: str) -> Rule:
    """Violations = non-null rows minus distinct non-null values."""
    return {"rule": "unique", "col": col, "kind": "unique", "pred": None}


def in_range(col: str, lo, hi) -> Rule:
    """Closed-interval bound; NULL counts as a violation (unknown is
    not provably in range — the Deequ convention)."""
    pred = ~((F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi)))
    return {"rule": f"in_range[{lo},{hi}]", "col": col, "kind": "predicate",
            "pred": pred | F.col(col).isNull()}


def in_set(col: str, values: list) -> Rule:
    """A ``None`` among ``values`` means "NULL is allowed". It must not
    reach ``isin``: SQL ``x IN (a, NULL)`` is NULL (never TRUE) for any
    non-member x, and the conditional violation count treats NULL as 0
    — the rule would silently stop counting real violations while still
    flagging actual NULLs, the exact inverse of the caller's intent
    (code-review r15)."""
    # None renders as "NULL" in the label: str(None) == 'None' would
    # make in_set(['ok', None]) and in_set(['ok', 'None']) — opposite
    # semantics — share a rule name (code-review r15).
    vals = ",".join("NULL" if v is None else str(v) for v in values)
    non_null = [v for v in values if v is not None]
    pred = ~F.col(col).isin(non_null)
    if None in values:
        pred = pred & F.col(col).isNotNull()
    else:
        pred = pred | F.col(col).isNull()
    return {"rule": f"in_set[{vals}]", "col": col, "kind": "predicate",
            "pred": pred}


def matches_regex(col: str, pattern: str) -> Rule:
    """Java/RE2-portable patterns only (no named groups)."""
    pred = ~F.col(col).rlike(pattern)
    return {"rule": f"matches_regex[{pattern}]", "col": col,
            "kind": "predicate", "pred": pred | F.col(col).isNull()}


def min_length(col: str, n: int) -> Rule:
    pred = F.length(F.col(col)) < F.lit(n)
    return {"rule": f"min_length[{n}]", "col": col, "kind": "predicate",
            "pred": pred | F.col(col).isNull()}


def expectations_report(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """Evaluate every rule in one aggregation pass.

    Returns (rule, col_name, violations, n_rows, passed) — one row per
    rule, deterministic content whatever the partitioning (conditional
    sums are associative integer arithmetic).
    """
    if not rules:
        raise ValueError("expectations_report requires at least one rule")
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for i, r in enumerate(rules):
        if r["kind"] == "unique":
            expr = (F.count(r["col"]) - F.count_distinct(F.col(r["col"]))).cast(
                "long"
            )
        else:
            expr = F.sum(F.when(r["pred"], 1).otherwise(0)).cast("long")
        aggs.append(expr.alias(f"__v{i}"))
    one = df.agg(*aggs)
    # Typed unpivot: explode an array<struct> built from F.lit columns.
    # Labels (rule names, column names, regex/in_set payloads) never pass
    # through a generated SQL string, so embedded quotes can't break the
    # expression (round-6 advice: stack('matches_regex[^O']', ...) was a
    # runtime parse error under the old string-built stack()).
    entries = F.array(
        *[
            F.struct(
                F.lit(r["rule"]).alias("rule"),
                F.lit(r["col"]).alias("col_name"),
                F.col(f"__v{i}").alias("violations"),
            )
            for i, r in enumerate(rules)
        ]
    )
    stacked = one.select(
        F.explode(entries).alias("kv"), F.col("__n").alias("n_rows")
    )
    return stacked.select(
        F.col("kv.rule").alias("rule"),
        F.col("kv.col_name").alias("col_name"),
        F.col("kv.violations").alias("violations"),
        "n_rows",
        (F.col("kv.violations") == 0).alias("passed"),
    )

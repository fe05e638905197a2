"""Query registry backing ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers a named Spark query and
(when SQL-expressible) the equivalent DuckDB oracle SQL. Keeping the
pair side by side in one decorator call is what keeps column names and
rounding in lock-step — the driver hash-compares values after sorting
columns by name, so any drift is a failed gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as oracle_sql()[name].

    ``oracle=None`` marks a non-SQL-expressible operator (LSH, streaming
    state, …) — the driver then records the weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


def load_all_suites() -> None:
    """Import every suite module so their @query decorators run."""
    from cirro_annotation_spark.suites import (  # noqa: F401
        dedup,
        manifest_suite,
        multimodal,
        relational,
        scalar,
        similarity,
        streaming_suite,
        text,
        windows,
    )

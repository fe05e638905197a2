"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over cirro_annotation_spark: the engine's query inventory
(one entry per SURVEY.md §2 operator) lives in
cirro_annotation_spark/suites/*, registered via the @query decorator
which keeps each Spark query and its DuckDB oracle SQL side by side.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from cirro_annotation_spark import registry
from cirro_annotation_spark.session import tune_existing

registry.load_all_suites()


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary (scan → pushdown filter → partial+final hash agg)."""
    tune_existing(spark)
    return registry.QUERIES["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # Priority-ordered: the driver hash-checks the first 50 entries, so
    # registry.PRIORITY pins oracle-backed representatives of every
    # operator family inside that window.
    return registry.ordered_queries()


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)

"""Plan-assertion tests — the 100 TB hygiene gate (SURVEY.md §4, §7.6).

Correct rows at sf0.001 do not prove the plan survives 1000 executors;
these assertions pin the properties that do: filters pushed to the
parquet scan, scans pruned to referenced columns, small dimensions
broadcast, the manifest pipeline shuffle-free.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from cirro_annotation_spark.plans import (
    count_exchanges,
    has_broadcast_join,
    has_pushed_filters,
    scan_read_schema,
)
from cirro_annotation_spark.suites.util import t


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 40).select(
        "l_orderkey", "l_quantity"
    )
    assert has_pushed_filters(df)


def test_column_pruning(spark, sf_dir):
    """A 2-column projection must not scan all 16 lineitem columns."""
    df = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    cols = scan_read_schema(df)
    assert set(cols) == {"l_orderkey", "l_quantity"}, cols


def test_small_dim_join_broadcasts(spark, sf_dir):
    nation = t(spark, sf_dir, "nation")
    customer = t(spark, sf_dir, "customer")
    df = customer.join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
    assert has_broadcast_join(df)


def test_melt_pipeline_shuffle_free(spark, sf_dir):
    """scan → project → unpivot (Expand) → no Exchange anywhere: the
    manifest pipeline is embarrassingly parallel (SURVEY.md §3.2)."""
    df = t(spark, sf_dir, "part").select("p_partkey", "p_retailprice", "p_size")
    melted = df.unpivot(["p_partkey"], ["p_retailprice", "p_size"], "k", "v")
    assert count_exchanges(melted) == 0


def test_groupby_is_single_exchange(spark, sf_dir):
    """Partial+final hash aggregation: exactly one shuffle, keyed on the
    group column."""
    df = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("sum_qty"))
    )
    assert count_exchanges(df) == 1


def test_events_ts_normalization_keeps_pushdown(spark, sf_dir):
    """The nanos→timestamp projection must not block predicate pushdown on
    OTHER columns of the events scan."""
    df = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    assert has_pushed_filters(df)

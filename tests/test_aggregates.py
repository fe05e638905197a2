"""Aggregate-operator properties that the SQL oracle can't check:
sketch error bounds for the approximate variants."""
from __future__ import annotations

from pyspark.sql import functions as F

from cirro_annotation_spark.suites.util import t


def test_approx_count_distinct_error_bound(spark, sf_dir):
    """agg_approx_distinct is rows-only at the oracle gate (HLL sketches
    are implementation-specific); this pins the accuracy contract
    instead: relative error within the configured rsd ceiling (default
    rsd 0.05 → assert a loose 3σ-ish 10% bound per group)."""
    li = t(spark, sf_dir, "lineitem")
    rows = (
        li.groupBy("l_returnflag")
        .agg(
            F.count_distinct("l_partkey").alias("exact"),
            F.approx_count_distinct("l_partkey").alias("approx"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        rel_err = abs(r["approx"] - r["exact"]) / max(r["exact"], 1)
        assert rel_err < 0.10, (r["l_returnflag"], r["exact"], r["approx"])


def test_approx_percentile_tracks_exact(spark, sf_dir):
    """approx_percentile (the 100 TB swap-in for percentile) must land
    within 1% of the exact interpolated quantile on a money column."""
    li = t(spark, sf_dir, "lineitem")
    row = li.agg(
        F.expr("percentile(l_extendedprice, 0.5)").alias("exact"),
        F.expr("approx_percentile(l_extendedprice, 0.5, 10000)").alias("approx"),
    ).collect()[0]
    assert abs(row["approx"] - row["exact"]) / row["exact"] < 0.01

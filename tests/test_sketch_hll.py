"""HLL mergeability contract (suites/relational.py:agg_hll_mergeable)."""
from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.01"


def test_hll_merge_equals_all_at_once_and_error_bounded(spark):
    if not os.path.isdir(SF):
        pytest.skip("fixture absent")
    from pyspark.sql import functions as F

    from cirro_annotation_spark.suites.util import t as T

    d = T(spark, SF, "events")
    # merged-from-parts MUST equal the single global sketch: HLL union
    # is lossless over sketches of the same lgK — the property that
    # makes per-partition maintenance sound.
    parts = d.groupBy("event_type").agg(F.hll_sketch_agg("user_id").alias("sk"))
    merged = parts.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e")
    ).collect()[0]["e"]
    direct = d.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    assert merged == direct

    exact = d.select("user_id").distinct().count()
    assert abs(merged - exact) / exact < 0.02


def test_hll_query_shape(spark):
    if not os.path.isdir(SF):
        pytest.skip("fixture absent")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = QUERIES["agg_hll_mergeable"](spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert abs(r.estimate - r.exact_distinct) / r.exact_distinct < 0.05


def test_register_halves_cover_negative_keys(spark):
    """pmod parity: every key lands in exactly one half, so the merged
    register equals r_all even with negative ids (Spark's signed % put
    negative odd keys in neither half — code-review r15)."""
    from cirro_annotation_spark.operators.sketches import hll_md5_register_cells

    df = spark.createDataFrame(
        [(k,) for k in (-7, -4, -3, -2, -1, 0, 1, 2, 3)], "user_id long"
    )
    out = hll_md5_register_cells(df).collect()
    assert out and all(r["merged_eq"] for r in out)

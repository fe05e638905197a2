"""Join-operator tests: as-of semantics, salted skew join equivalence."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cirro_annotation_spark.operators.joins import asof_join, salted_join


def test_asof_inclusive_tie_and_carry_forward(spark):
    left = spark.createDataFrame(
        [(1, 10), (1, 20), (1, 30)], "k long, lts long"
    ).select("k", F.col("lts").cast("timestamp").alias("lts"))
    right = spark.createDataFrame(
        [(1, 10, "a"), (1, 25, "b")], "k long, rts long, v string"
    ).select("k", F.col("rts").cast("timestamp").alias("rts"), "v")
    out = asof_join(left, right, "k", "lts", "rts", ["v"])
    got = {int(r["lts"].timestamp()): r["v_asof"] for r in out.collect()}
    assert got == {10: "a", 20: "a", 30: "b"}  # tie at 10 is inclusive


def test_salted_join_equals_plain_join(spark, sf_dir):
    """Salting must not change the result set — only the partitioning."""
    from cirro_annotation_spark.suites.util import t

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = t(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_orderstatus"
    )
    plain = li.join(orders, "l_orderkey").groupBy("o_orderstatus").count()
    salted = (
        salted_join(li, orders, "l_orderkey", salt_buckets=8)
        .groupBy("o_orderstatus")
        .count()
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_join_left_outer(spark):
    big = spark.createDataFrame([(1, "x"), (2, "y")], "k long, a string")
    small = spark.createDataFrame([(1, "dim1")], "k long, d string")
    out = salted_join(big, small, "k", salt_buckets=4, how="left")
    rows = {(r["k"], r["d"]) for r in out.collect()}
    assert rows == {(1, "dim1"), (2, None)}


def test_salted_join_rejects_right_and_full(spark):
    """right/full would emit unmatched replicated small-side rows
    salt_buckets times — the operator must refuse, not corrupt."""
    big = spark.createDataFrame([(1, "x")], "k long, a string")
    small = spark.createDataFrame([(1, "d"), (9, "unmatched")], "k long, d string")
    for bad in ("right", "full", "full_outer", "rightouter"):
        with pytest.raises(ValueError, match="salted_join"):
            salted_join(big, small, "k", how=bad)


def test_asof_tolerance_nulls_stale_matches(spark):
    left = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00"), (2, "2024-01-01 23:00:00")],
        "id long, ts_s string",
    ).select("id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [("2024-01-01 09:30:00", 100.0)], "ts_s string, px double"
    ).select(F.to_timestamp("ts_s").alias("ts"), "px").withColumn("id", F.lit(0))
    # both sides share key 0 so the join partitions on a constant
    left = left.withColumn("key", F.lit(0))
    right = right.withColumn("key", F.lit(0))
    out = {
        r["id"]: r["px_asof"]
        for r in asof_join(
            left, right, "key", "ts", "ts", ["px"], tolerance_seconds=3600
        ).collect()
    }
    assert out[1] == 100.0      # 30 min old: within tolerance
    assert out[2] is None       # 13.5 h old: stale, nulled


def test_aqe_splits_skewed_join_partitions(spark):
    """AQE's runtime skew handling, observed: a join where 90% of the
    left rows share one hot key gets its skewed partition SPLIT
    (skew=true in the executed sort-merge join) instead of one straggler
    task. This is the default-path answer to skew; salted_join is the
    manual fallback when AQE can't apply."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = spark.range(0, 500_000).select(
            F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("v"),
        )
        right = spark.range(0, 50_000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").groupBy().agg(F.count(F.lit(1)).alias("n"))
        assert j.collect()[0]["n"] == 455_000  # join is still correct
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_asof_properties_hypothesis(spark):
    """Property check over generated event sets: (1) the as-of match is
    never in the left row's future; (2) it is the MAX eligible right ts;
    (3) an infinite tolerance equals no tolerance."""
    from hypothesis import given, settings, strategies as st

    ts0 = 1_700_000_000

    @settings(max_examples=10, deadline=None)
    @given(
        lefts=st.lists(st.integers(0, 5000), min_size=1, max_size=8),
        rights=st.lists(st.integers(0, 5000), min_size=0, max_size=8),
    )
    def prop(lefts, rights):
        ldf = spark.createDataFrame(
            [(i, 0, ts0 + s) for i, s in enumerate(lefts)], "id long, k long, sec long"
        ).select("id", "k", F.timestamp_seconds("sec").alias("ts"))
        rdf = spark.createDataFrame(
            [(0, ts0 + s, float(s)) for s in rights] or [(1, ts0, 0.0)],
            "k long, sec long, val double",
        ).select("k", F.timestamp_seconds("sec").alias("ts"), "val")
        out = {
            r["id"]: r["val_asof"]
            for r in asof_join(ldf, rdf, "k", "ts", "ts", ["val"]).collect()
        }
        out_tol = {
            r["id"]: r["val_asof"]
            for r in asof_join(
                ldf, rdf, "k", "ts", "ts", ["val"], tolerance_seconds=10**9
            ).collect()
        }
        assert out == out_tol  # infinite tolerance == no tolerance
        for i, ls in enumerate(lefts):
            eligible = [s for s in rights if s <= ls]
            want = float(max(eligible)) if eligible else None
            assert out[i] == want, (i, ls, rights, out)

    prop()


def test_asof_null_value_row_is_the_match(spark):
    """ROW semantics: if the most recent right row carries a NULL value,
    the as-of result is NULL — it must not fall through to an older
    row's value (per-column last(ignorenulls) did exactly that)."""
    left = spark.createDataFrame(
        [(1, 0, "2024-01-01 11:00:00")], "id long, k long, ts_s string"
    ).select("id", "k", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [(0, "2024-01-01 09:00:00", 100.0), (0, "2024-01-01 10:59:00", None)],
        "k long, ts_s string, px double",
    ).select("k", F.to_timestamp("ts_s").alias("ts"), "px")
    out = asof_join(left, right, "k", "ts", "ts", ["px"]).collect()
    assert out[0]["px_asof"] is None
    # and with a 1h tolerance the (in-tolerance, NULL-valued) row still
    # wins — the stale 09:00 value must not leak through the bound
    out_tol = asof_join(
        left, right, "k", "ts", "ts", ["px"], tolerance_seconds=3600
    ).collect()
    assert out_tol[0]["px_asof"] is None


# ---------------------------------------------------------------------------
# asof_join_nearest


def test_asof_nearest_directions_and_ties(spark):
    from datetime import datetime

    from cirro_annotation_spark.operators.joins import asof_join_nearest

    ts = lambda s: datetime(2024, 1, 1, 0, 0, s)  # noqa: E731
    left = spark.createDataFrame(
        [
            (1, 10, ts(10)),  # past at 8 (d=2), future at 15 (d=5) -> past
            (2, 10, ts(14)),  # past at 8 (d=6), future at 15 (d=1) -> future
            (3, 10, ts(20)),  # no future; past 15 (d=5) -> past
            (4, 20, ts(5)),   # key with no right rows -> nulls
            (5, 30, ts(12)),  # tie: past at 10 (d=2), future at 14 (d=2) -> past
            (6, 40, ts(7)),   # right row at SAME ts -> past, d=0
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (10, ts(8)), (10, ts(15)),
            (30, ts(10)), (30, ts(14)),
            (40, ts(7)), (40, ts(6)),
        ],
        "user_id long, ts timestamp",
    )
    rows = {
        r["event_id"]: (r["ts_nearest"], r["direction_nearest"])
        for r in asof_join_nearest(
            left, right, partition_key="user_id", left_ts="ts", right_ts="ts"
        ).collect()
    }
    assert rows[1] == (ts(8), "past")
    assert rows[2] == (ts(15), "future")
    assert rows[3] == (ts(15), "past")
    assert rows[4] == (None, None)
    assert rows[5] == (ts(10), "past")
    assert rows[6] == (ts(7), "past")


def test_asof_nearest_single_exchange_plan(spark):
    """Both direction carries must share one WindowExec sort — the plan
    may contain only ONE exchange for the union'd frame."""
    from datetime import datetime

    from cirro_annotation_spark.operators.joins import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 1, datetime(2024, 1, 1))], "event_id long, user_id long, ts timestamp"
    )
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 1))], "user_id long, ts timestamp"
    )
    out = asof_join_nearest(
        left, right, partition_key="user_id", left_ts="ts", right_ts="ts"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1
    assert plan.count("Window") == 1


def test_asof_duplicate_right_ts_is_deterministic(spark):
    """Two right rows at the same (key, ts): the attached value must be
    the same on every run/layout — the xxhash64 struct tie-break
    (code-review r15). Pinned against the max-hash rule itself."""
    ts0 = 1_700_000_000
    ldf = spark.createDataFrame([(1, 0, ts0 + 100)], "id long, k long, sec long").select(
        "id", "k", F.timestamp_seconds("sec").alias("ts")
    )
    dup_vals = [10.0, 20.0, 30.0]
    rdf = spark.createDataFrame(
        [(0, ts0 + 50, v) for v in dup_vals], "k long, sec long, val double"
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "val")

    picks = set()
    for nparts in (1, 2, 5):
        out = asof_join(
            ldf, rdf.repartition(nparts), "k", "ts", "ts", ["val"]
        ).first()
        picks.add(out["val_asof"])
    assert len(picks) == 1, picks
    # the winner is the max-xxhash64 struct, by contract
    hashed = rdf.select(
        "val",
        F.xxhash64(
            F.struct(F.col("ts").alias("__rts"), F.col("val").alias("val_asof"))
        ).alias("h"),
    ).collect()
    want = max(hashed, key=lambda r: r["h"])["val"]
    assert picks == {want}


def test_asof_map_typed_value_column_still_works(spark):
    """xxhash64 rejects MAP — the tie-break must skip map-typed value
    columns instead of blowing up the whole join (code-review r15
    second pass)."""
    ts0 = 1_700_000_000
    ldf = spark.createDataFrame([(1, 0, ts0 + 10)], "id long, k long, sec long").select(
        "id", "k", F.timestamp_seconds("sec").alias("ts")
    )
    rdf = spark.createDataFrame(
        [(0, ts0 + 5, {"a": 1}, 7.0)],
        "k long, sec long, payload map<string,long>, val double",
    ).select("k", F.timestamp_seconds("sec").alias("ts"), "payload", "val")
    out = asof_join(ldf, rdf, "k", "ts", "ts", ["payload", "val"]).first()
    assert out["val_asof"] == 7.0 and out["payload_asof"] == {"a": 1}

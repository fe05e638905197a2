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


def test_psi_drift_detects_planted_shift(spark, tmp_path):
    """A distribution shift between the two temporal halves must produce
    a large PSI sum; identical halves produce ~0 (smoothing noise only)."""
    import os
    from pyspark.sql import functions as F
    from cirro_annotation_spark.suites.windows import events_psi_drift

    base = spark.range(2000).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        F.lit(1).alias("user_id"),
        F.lit("a").alias("event_type"),
        # first half ~ [0,50) bucket 0; second half ~ [200,250) bucket 4
        F.when(F.col("id") < 1000, F.col("id") % 50.0)
        .otherwise(200.0 + F.col("id") % 50.0)
        .alias("value"),
        F.lit(None).cast("string").alias("props"),
    )
    td = str(tmp_path)
    base.write.parquet(os.path.join(td, "events.parquet"))
    rows = events_psi_drift(spark, td).collect()
    psi = sum(r["psi_contrib"] for r in rows)
    assert psi > 1.0, psi  # total swap of mass between buckets

    flat = base.withColumn("value", F.col("event_id") % 50.0)
    td2 = os.path.join(td, "flat")
    os.makedirs(td2)
    flat.write.parquet(os.path.join(td2, "events.parquet"))
    rows2 = events_psi_drift(spark, td2).collect()
    psi2 = sum(abs(r["psi_contrib"]) for r in rows2)
    assert psi2 < 0.05, psi2


def test_scd2_intervals_partition_timeline(spark):
    """SCD2 contract: per user, intervals chain exactly (valid_to of row
    k == valid_from of row k+1) and exactly one open (is_current) row."""
    import __spark_entry__ as se

    out = se.queries()["events_scd2_history"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_user = {}
    for r in out:
        by_user.setdefault(r["user_id"], []).append(r)
    assert by_user
    for rows in by_user.values():
        rows.sort(key=lambda r: (r["valid_from"], r["event_id"]))
        assert sum(r["is_current"] for r in rows) == 1
        assert rows[-1]["valid_to"] is None and rows[-1]["is_current"] == 1
        for a, b in zip(rows, rows[1:]):
            assert a["valid_to"] == b["valid_from"]


def test_transition_probabilities_sum_to_one(spark):
    import __spark_entry__ as se

    out = se.queries()["events_type_transitions"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    sums = {}
    for r in out:
        sums[r["prev_type"]] = sums.get(r["prev_type"], 0.0) + r["p_next"]
    assert sums and all(abs(s - 1.0) < 1e-4 for s in sums.values())


def test_ohlc_bounds_contract(spark):
    import __spark_entry__ as se

    rows = se.queries()["events_ohlc_daily"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["low"] <= r["open"] <= r["high"]
        assert r["low"] <= r["close"] <= r["high"]
        assert r["n_events"] >= 1


def test_covariance_diag_nonnegative_and_present(spark):
    import __spark_entry__ as se

    rows = se.queries()["embeddings_covariance"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    got = {(r["dim_i"], r["dim_j"]): r["cov"] for r in rows}
    assert len(got) == 36  # upper triangle of 8x8
    for d in range(1, 9):
        assert got[(d, d)] >= 0  # variances


def test_basket_lift_definition_on_tiny_corpus(spark):
    """lift > 1 for a planted always-together pair, and the rule table
    honors min-support."""
    from cirro_annotation_spark.registry import QUERIES
    import pyspark.sql.functions as F  # noqa: F401

    rows = QUERIES["basket_rules_lift"](spark, "/root/testdata/sf0.001").collect()
    assert rows and all(r["pair_cnt"] >= 2 for r in rows)
    ranks = [r["rule_rank"] for r in rows]
    assert ranks == sorted(ranks) and ranks[0] == 1
    assert all(0 < r["conf_ab"] <= 1 for r in rows)


def test_skyline_pareto_hostile_ties(spark):
    """Skyline dominance edge cases: equal-price/equal-size duplicates
    collapse to one surviving coordinate; equal size at higher price
    and equal price at smaller size are dominated; incomparable points
    all survive."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    # (partkey, price, size): skyline should be (10.0,9) and (5.0,4)
    rows = [
        (1, 10.0, 9), (2, 10.0, 9),   # duplicate coordinate, n_pts=2
        (3, 12.0, 9),                 # equal size, higher price -> dominated
        (4, 10.0, 7),                 # equal price, smaller size -> dominated
        (5, 5.0, 4),                  # incomparable (cheaper, smaller)
        (6, 6.0, 3),                  # dominated by (5.0, 4)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "p_partkey long, p_retailprice double, p_size int"
        ).toPandas().to_parquet(os.path.join(tmp, "part.parquet"))
        out = {
            (r["price"], r["size"]): r["n_pts"]
            for r in QUERIES["sort_skyline_pareto"](spark, tmp).collect()
        }
    assert out == {(10.0, 9): 2, (5.0, 4): 1}


def test_weighted_median_exact_threshold(spark):
    """Weighted median = smallest value whose cumulative weight reaches
    half the total: weights 1,1,8 over values 10,20,30 -> median 30;
    exactly-half boundary (2*cw == tw) picks the lower value."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [
        # grp A: total 10, cum at 30 is 10 -> first 2*cw>=10 at v=30? No:
        # cum(10)=1, cum(20)=2, cum(30)=10 -> 2*2 < 10, median=30
        (1, 1, 1, "A", 1.0, 10.0),
        (1, 2, 2, "A", 1.0, 20.0),
        (1, 3, 3, "A", 8.0, 30.0),
        # grp B: equal halves 5/5 -> 2*5 >= 10 at the LOWER value 100
        (2, 1, 1, "B", 5.0, 100.0),
        (2, 2, 2, "B", 5.0, 200.0),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_linenumber int, "
            "l_returnflag string, l_quantity double, l_extendedprice double",
        ).toPandas().to_parquet(os.path.join(tmp, "lineitem.parquet"))
        out = {
            r["l_returnflag"]: (r["weighted_median"], r["total_weight"])
            for r in QUERIES["agg_weighted_median"](spark, tmp).collect()
        }
    assert out == {"A": (30.0, 10), "B": (100.0, 10)}


def test_mode_tiebreak_smallest_user(spark):
    """Two users tie at 2 events for type 'x' -> the smaller user_id
    wins deterministically."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [
        (i, datetime(2024, 1, 1 + i), u, "x", 1.0, "{}")
        for i, u in enumerate([7, 7, 3, 3, 9])
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["agg_mode_per_group"](spark, tmp).collect()
    assert len(out) == 1
    assert out[0]["modal_user"] == 3 and out[0]["n_events"] == 2


def test_abc_classes_planted_shares(spark):
    """Revenues 80/15/5: boundaries sit exactly on the 80% and 95%
    cross-multiplied thresholds -> classes A/B/C with exact ppm
    shares."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    # one lineitem row per part; price*100 = cents
    rows = [
        (1, 1, 1, 1, 1.0, 0.80),
        (2, 2, 1, 1, 1.0, 0.15),
        (3, 3, 1, 1, 1.0, 0.05),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_suppkey long, "
            "l_linenumber int, l_quantity double, l_extendedprice double",
        ).toPandas().to_parquet(os.path.join(tmp, "lineitem.parquet"))
        out = {
            r["abc_class"]: (r["n_parts"], r["revenue_cents"],
                             r["revenue_share_ppm"])
            for r in QUERIES["orders_abc_analysis"](spark, tmp).collect()
        }
    assert out == {
        "A": (1, 80, 800000),
        "B": (1, 15, 150000),
        "C": (1, 5, 50000),
    }


def test_kmv_not_full_is_exact(spark):
    """With 10 distinct users the 256-slot sketch is not full: the
    estimate equals the exact count, k equals the seen-domain size,
    and the half-merge reproduces kth_min."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [
        (i, datetime(2024, 1, 1 + (i % 20)), i % 10, "view", 1.0, "{}")
        for i in range(50)  # 50 events, 10 distinct users
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["agg_kmv_distinct"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["k"] == 10 and r["est_distinct"] == 10
    assert r["exact_distinct"] == 10 and r["merged_eq"] is True


def test_skyline_two_phase_equals_naive_randomized(spark):
    """Randomized equivalence: the two-phase (bucket-local then global)
    skyline must return exactly the naive O(n²) dominance survivors
    for arbitrary point multisets — any duplicate/tie pattern, any
    bucket boundary placement. (Deterministic seeds; Python computes
    the naive frontier over distinct coordinates.)"""
    import os
    import random
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rng = random.Random(22012)
    for trial in range(3):
        pts = [
            (rng.randint(0, 40) * 25.0, rng.randint(1, 12))
            for _ in range(rng.randint(1, 300))
        ]
        from collections import Counter

        coord_n = Counter(pts)
        coords = set(coord_n)
        naive = {
            (p, s): n
            for (p, s), n in coord_n.items()
            if not any(
                (q < p and u >= s) or (q <= p and u > s)
                for (q, u) in coords
            )
        }
        rows = [
            (i, p, s) for i, (p, s) in enumerate(pts)
        ]
        with tempfile.TemporaryDirectory() as tmp:
            spark.createDataFrame(
                rows, "p_partkey long, p_retailprice double, p_size int"
            ).toPandas().to_parquet(os.path.join(tmp, "part.parquet"))
            got = {
                (r["price"], r["size"]): r["n_pts"]
                for r in QUERIES["sort_skyline_pareto"](spark, tmp).collect()
            }
        assert got == naive, f"trial {trial}"


def test_user_streaks_randomized_vs_bruteforce(spark):
    """Randomized equivalence: the islands arithmetic must match a
    brute-force Python streak scan for arbitrary per-user day sets."""
    import os
    import random
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rng = random.Random(7312)
    days_by_user = {
        u: sorted(rng.sample(range(1, 28), rng.randint(1, 20)))
        for u in range(1, 8)
    }
    want = {}
    for u, days in days_by_user.items():
        streaks, cur = [], 1
        for a, b in zip(days, days[1:]):
            if b == a + 1:
                cur += 1
            else:
                streaks.append(cur)
                cur = 1
        streaks.append(cur)
        want[u] = (max(streaks), len(days), len(streaks))
    rows = []
    eid = 0
    for u, days in days_by_user.items():
        for d in days:
            eid += 1
            rows.append((eid, datetime(2024, 1, d, 9, 0), u, "view", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        got = {
            r["user_id"]: (r["max_streak"], r["active_days"], r["n_streaks"])
            for r in QUERIES["events_user_streaks"](spark, tmp).collect()
        }
    assert got == want


def test_weighted_median_randomized_vs_bruteforce(spark):
    """Randomized equivalence: the cumulative-weight threshold pick
    must match a brute-force weighted-median scan for arbitrary
    integer-weight multisets."""
    import os
    import random
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rng = random.Random(9412)
    rows, want = [], {}
    oid = 0
    for gi, grp in enumerate(["A", "B", "C"]):
        vals = sorted(
            {rng.randint(1, 50) * 10.0 for _ in range(rng.randint(1, 30))}
        )
        weights = [rng.randint(1, 9) for _ in vals]
        tot = sum(weights)
        cum = 0
        for v, w in zip(vals, weights):
            cum += w
            if 2 * cum >= tot:
                want[grp] = (v, tot)
                break
        for i, (v, w) in enumerate(zip(vals, weights)):
            oid += 1
            rows.append((oid, i + 1, 1, grp, float(w), v))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "l_orderkey long, l_partkey long, l_linenumber int, "
            "l_returnflag string, l_quantity double, l_extendedprice double",
        ).toPandas().to_parquet(os.path.join(tmp, "lineitem.parquet"))
        got = {
            r["l_returnflag"]: (r["weighted_median"], r["total_weight"])
            for r in QUERIES["agg_weighted_median"](spark, tmp).collect()
        }
    assert got == want


def test_abc_distributed_prefix_sum_randomized_vs_naive(spark):
    """Randomized equivalence: the global_rank + bucket-offset prefix
    sum must classify exactly as the naive ordered running total, for
    arbitrary revenue multisets including ties (tie-break partkey)."""
    import os
    import random
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rng = random.Random(31415)
    for trial in range(2):
        parts = {}
        for pk in range(1, rng.randint(5, 120)):
            parts[pk] = rng.randint(1, 40) * 5  # cents, many ties
        # naive classification
        tot = sum(parts.values())
        cum = 0
        want = {"A": [0, 0], "B": [0, 0], "C": [0, 0]}
        for pk, cents in sorted(parts.items(), key=lambda x: (-x[1], x[0])):
            cum += cents
            cls = "A" if cum * 100 <= tot * 80 else (
                "B" if cum * 100 <= tot * 95 else "C")
            want[cls][0] += 1
            want[cls][1] += cents
        want = {k: tuple(v) for k, v in want.items() if v[0]}
        rows = [
            (pk, pk, 1, 1, 1.0, cents / 100.0) for pk, cents in parts.items()
        ]
        with tempfile.TemporaryDirectory() as tmp:
            spark.createDataFrame(
                rows,
                "l_orderkey long, l_partkey long, l_suppkey long, "
                "l_linenumber int, l_quantity double, l_extendedprice double",
            ).toPandas().to_parquet(os.path.join(tmp, "lineitem.parquet"))
            got = {
                r["abc_class"]: (r["n_parts"], r["revenue_cents"])
                for r in QUERIES["orders_abc_analysis"](spark, tmp).collect()
            }
        assert got == want, f"trial {trial}"


def test_iqr_fences_planted_outlier(spark):
    """9 balances 100..900 plus one 100000-cent outlier: Q1/Q3 are the
    exact type-1 order statistics and exactly one high outlier falls
    outside the Tukey fence."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    vals = [float(v) for v in range(1, 10)] + [1000.0]  # dollars
    rows = [(i, f"c{i}", 1, v, "SEG") for i, v in enumerate(vals)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "c_custkey long, c_name string, c_nationkey long, "
            "c_acctbal double, c_mktsegment string"
        ).toPandas().to_parquet(os.path.join(tmp, "customer.parquet"))
        out = QUERIES["agg_iqr_outlier_fences"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    # n=10: q1 at rank ceil(10/4)=3 -> 300 cents; q3 at rank ceil(30/4)=8 -> 800
    assert r["q1_cents"] == 300 and r["q3_cents"] == 800
    assert r["n_low_outliers"] == 0 and r["n_high_outliers"] == 1

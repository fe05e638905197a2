"""Property tests for the Misra-Gries heavy-hitter operators."""
from __future__ import annotations

import random

from pyspark.sql import functions as F

from cirro_annotation_spark.operators.sketches import (
    heavy_hitters_exact,
    misra_gries_candidates,
)


def _df(spark, values, partitions=8):
    return spark.createDataFrame(
        [(v,) for v in values], "v long"
    ).repartition(partitions)


def test_superset_guarantee_skewed(spark):
    # 3 heavy values spread across partitions + uniform noise: every
    # true heavy hitter MUST appear in the candidate union even with a
    # tiny m and adversarial partitioning.
    rng = random.Random(7)
    values = [1] * 400 + [2] * 300 + [3] * 200 + [rng.randrange(100, 2000) for _ in range(1100)]
    rng.shuffle(values)
    df = _df(spark, values, partitions=16)
    m = 8
    cands = set(r.v for r in misra_gries_candidates(df, "v", m).collect())
    n = len(values)
    truth = {1, 2, 3} if min(400, 300, 200) * (m + 1) > n else set()
    for v in (1, 2, 3):
        count = {1: 400, 2: 300, 3: 200}[v]
        if count * (m + 1) > n:
            assert v in cands, f"heavy value {v} missing from candidates"


def test_exact_result_matches_groupby(spark):
    rng = random.Random(11)
    values = [1] * 500 + [2] * 250 + [rng.randrange(10, 500) for _ in range(1250)]
    rng.shuffle(values)
    df = _df(spark, values, partitions=12)
    m = 15
    got = {
        (r.v, r.cnt) for r in heavy_hitters_exact(df, "v", m).collect()
    }
    n = len(values)
    exact = {
        (r.v, r.cnt)
        for r in df.groupBy("v")
        .agg(F.count("*").alias("cnt"))
        .filter(F.col("cnt") * (m + 1) > n)
        .collect()
    }
    assert got == exact and (1, 500) in got


def test_candidates_bounded_per_partition(spark):
    values = list(range(5000))  # all distinct — worst case for MG
    df = _df(spark, values, partitions=4)
    m = 10
    n_cands = misra_gries_candidates(df, "v", m).count()
    assert n_cands <= m * 4


def test_partitioning_invariance(spark):
    values = [1] * 300 + [2] * 200 + list(range(1000, 2000))
    m = 20
    a = {(r.v, r.cnt) for r in heavy_hitters_exact(_df(spark, values, 2), "v", m).collect()}
    b = {(r.v, r.cnt) for r in heavy_hitters_exact(_df(spark, values, 32), "v", m).collect()}
    assert a == b


def test_bitmap_distinct_exact_with_bit31(spark):
    """Exact bitmap distinct on a planted id set including the word
    boundary and bit-31 edge (id 31 -> shiftleft(1L, 31) must not
    wrap): ids {0, 31, 32, 63, 64, 1000} -> 6 distinct over 4 words,
    merge contract true."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    ids = [0, 31, 32, 63, 64, 1000, 0, 31]  # duplicates collapse
    rows = [
        (i, datetime(2024, 1, 1 + (i % 20)), u, "view", 1.0, "{}")
        for i, u in enumerate(ids)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["agg_bitmap_distinct"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert r["distinct_users"] == 6 == r["exact_distinct"]
    assert r["n_words"] == 4  # words 0, 1, 2, 31
    assert r["merged_eq"] is True


def test_dp_noisy_counts_deterministic_and_bounded(spark):
    """The seeded release is reproducible (same table -> identical
    micro counts) and the Laplace(2) noise magnitude is bounded by
    2 * max(-ln(u)) * 1e6 on the 16-bit lattice (u >= 1/131072 ->
    |noise| <= 2 * 11.783 * 1e6)."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [(i, f"text {i}", "en", f"src{i % 3}", 10) for i in range(30)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, "
            "n_chars long"
        ).toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
        a = {r["source"]: r["noisy_count_micro"]
             for r in QUERIES["docs_dp_noisy_counts"](spark, tmp).collect()}
        b = {r["source"]: r["noisy_count_micro"]
             for r in QUERIES["docs_dp_noisy_counts"](spark, tmp).collect()}
    assert a == b and len(a) == 3
    for src, micro in a.items():
        true_micro = 10 * 1_000_000
        assert abs(micro - true_micro) <= 2 * 11_783_000

"""Engine-exactness probe for sample_es_reservoir's micro-log lattice.

The r10 A-ES attempt failed the 10x tier on a last-ulp ln divergence
because its uniform domain wasn't enumerable. This one is: u =
(2b+1)/131072 has exactly 65536 points, so the whole construction is
probed — if floor(-ln(u)*1e6) agrees Spark-vs-DuckDB on every lattice
point, the downstream key arithmetic is pure positive-BIGINT division
and can never diverge, at any corpus size.
"""
from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_micro_log_lattice_parity_all_65536_points(spark):
    sdf = spark.range(65536).select(
        F.col("id").alias("b"),
        F.floor(-F.log((2 * F.col("id") + 1) / F.lit(131072.0)) * 1000000)
        .cast("long")
        .alias("m"),
    )
    sp = {r["b"]: r["m"] for r in sdf.collect()}
    du = dict(
        duckdb.sql(
            "SELECT b, CAST(FLOOR(-LN((2*b+1)/131072.0)*1000000) AS BIGINT) "
            "FROM range(65536) t(b)"
        ).fetchall()
    )
    diff = [b for b in sp if sp[b] != du[b]]
    assert not diff, f"ln lattice divergence at {len(diff)} points: {diff[:5]}"


def test_es_reservoir_weights_raise_inclusion(spark):
    """Efraimidis-Spirakis property: heavier rows are sampled more
    often. With weights 1000 vs 10 planted over 2000 docs, the heavy
    half must dominate a k=200 sample (in expectation ~99% of it)."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [(i, 1000 if i % 2 == 0 else 10) for i in range(2000)]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, n_chars int"
        ).toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))
        out = QUERIES["sample_es_reservoir"](spark, tmp).collect()
    assert len(out) == 150
    heavy = sum(1 for r in out if r["n_chars"] == 1000)
    assert heavy >= 135, f"heavy rows underrepresented: {heavy}/150"
    # keys ascend and respect the deterministic tie-break
    keys = [(r["key_q"], r["doc_id"]) for r in out]
    assert keys == sorted(keys)


def test_lc_branch_lattice_parity_all_4095_points(spark):
    """agg_hll_md5_estimate's linear-counting branch emits
    ROUND(4096·ln(4096/V), 3) with V = empty buckets — a 4096-point
    lattice. Probe every point Spark-vs-DuckDB so the branch can never
    diverge at any corpus size."""
    sdf = spark.range(1, 4096).select(
        F.col("id").alias("v"),
        F.round(
            F.lit(4096.0) * F.log(F.lit(4096.0) / F.col("id").cast("double")),
            3,
        ).alias("lc"),
    )
    sp = {r["v"]: r["lc"] for r in sdf.collect()}
    du = dict(
        duckdb.sql(
            "SELECT v, ROUND(4096.0 * LN(4096.0 / CAST(v AS DOUBLE)), 3) "
            "FROM range(1, 4096) t(v)"
        ).fetchall()
    )
    diff = [v for v in sp if sp[v] != du[v]]
    assert not diff, f"LC lattice divergence at {len(diff)} points: {diff[:5]}"

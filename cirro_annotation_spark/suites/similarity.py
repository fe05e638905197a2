"""Similarity-search queries over embeddings (north-star, SURVEY.md §2.12).

The brute-force cosine paths are oracle-checked against DuckDB (positional
UNNEST zip + explicit dot/norm arithmetic, same fold order, rounded to 6dp).
The LSH paths depend on seeded hyperplanes → rows-only + pytest recall tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cirro_annotation_spark.operators import similarity as S
from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import t

# Query = vec_id 0's embedding, fetched per scale factor (one-row driver
# lookup; the vector then broadcasts into the plan as a literal).
_QUERY_VEC_ID = 0

_COSINE_ALL_ORACLE = f"""
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv
               FROM embeddings WHERE vec_id = {_QUERY_VEC_ID}),
    z AS (SELECT e.vec_id,
                 UNNEST(CAST(e.embedding AS DOUBLE[])) AS x,
                 UNNEST(q.qv) AS y
          FROM embeddings e CROSS JOIN q)
    SELECT vec_id,
           ROUND(SUM(x * y) / (SQRT(SUM(x * x)) * SQRT(SUM(y * y))), 6) AS cosine_sim
    FROM z GROUP BY vec_id
"""


def _query_vec(spark: SparkSession, sf_dir: str) -> list[float]:
    row = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == _QUERY_VEC_ID)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row[0]]


@query("sim_cosine_all", oracle=_COSINE_ALL_ORACLE)
def sim_cosine_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine of every vector vs the query vector — the exact kernel,
    verified value-by-value (no top-k boundary effects)."""
    emb = t(spark, sf_dir, "embeddings")
    q = F.array(*[F.lit(v) for v in _query_vec(spark, sf_dir)])
    v = F.col("embedding").cast("array<double>")
    return emb.select(
        "vec_id", F.round(S.cosine(v, q), 6).alias("cosine_sim")
    )


@query(
    "sim_topk_cosine",
    oracle=f"""
    SELECT vec_id, cosine_sim FROM ({_COSINE_ALL_ORACLE})
    ORDER BY cosine_sim DESC, vec_id ASC LIMIT 10
    """,
)
def sim_topk_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.topk_cosine_bruteforce(
        emb, "embedding", "vec_id", _query_vec(spark, sf_dir), k=10
    )


@query("sim_topk_lsh")  # seeded-hyperplane approximate path — rows-only
def sim_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.topk_cosine_lsh(
        emb, "embedding", "vec_id", _query_vec(spark, sf_dir), k=10, n_planes=6
    )


@query("sim_near_dup_embeddings")  # rows-only
def sim_near_dup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = t(spark, sf_dir, "embeddings")
    return S.near_dup_pairs_cosine(
        emb, "embedding", "vec_id", threshold=0.95, n_planes=10
    )


@query("sim_topk_ivf")  # k-means cells; float-avg centroids — rows-only
def sim_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-Flat: k-means coarse quantizer trained with DataFrame ops
    (broadcast-literal centroids, map-side argmin assignment, posexplode +
    avg refit), then nprobe-limited exact search. Recall vs brute force is
    pinned in tests/test_similarity.py."""
    emb = t(spark, sf_dir, "embeddings")
    centroids = S.train_centroids_kmeans(emb, "embedding", "vec_id", k=8, iterations=2)
    return S.ivf_topk_cosine(
        emb, "embedding", "vec_id", _query_vec(spark, sf_dir), centroids, k=10, nprobe=3
    )


@query(
    "sim_centroid_per_label",
    oracle=f"""
    WITH z AS (SELECT label,
                      UNNEST(CAST(embedding AS DOUBLE[])) AS x,
                      GENERATE_SUBSCRIPTS(embedding, 1) AS dim
               FROM embeddings)
    SELECT label, dim, ROUND(AVG(x), 6) AS centroid_val
    FROM z WHERE dim <= 4
    GROUP BY label, dim
    """,
)
def sim_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid (first 4 dims) — the aggregation kernel an IVF
    index build needs (posexplode + avg per (label, dim))."""
    emb = t(spark, sf_dir, "embeddings")
    return (
        emb.select(
            "label",
            F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
        )
        .select("label", (F.col("pos") + 1).alias("dim"), "x")
        .filter(F.col("dim") <= 4)
        .groupBy("label", "dim")
        .agg(F.round(F.avg("x"), 6).alias("centroid_val"))
    )

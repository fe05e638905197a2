"""Distributed k-means (Lloyd) training over embedding columns.

Reference parity note: the reference (CirroBio/Cirro-Annotation) has no
clustering operator; this module belongs to the large-scale-pipeline
extension surface. The IVF / IVF-PQ / SemDeDup queries in
``operators/similarity.py`` all CONSUME centroids (pinned literals
today, exactly what a production pipeline materializes from a training
job); this module is that training job, re-expressed Spark-first — the
missing producer half of the centroid lifecycle.

Determinism contract (the graph-family discipline applied to an ML
fixed point): embeddings are quantized ONCE to an integer lattice
(``floor(x * 10000)`` — float32→float64 promotion is exact and IEEE
multiply/floor round identically on both engines), centroids live on
the same lattice via FLOOR-division mean (``sum // count``), and every
distance is an exact BIGINT sum of squared integer differences, so
assignments, counts, and inertia are engine-exact and the full
iterative result hash-matches a DuckDB unrolled-CTE oracle. Magnitude
audit: |x| <= ~5e4 lattice units, diff^2 <= ~1e10, * 64 dims <= ~6e11
per distance; inertia sums n of those (~6e15 at 10k vectors) — far
inside BIGINT.

Ties and degenerate cases are pinned: argmin tie -> lowest centroid
id (struct ordering on (dist, cid)); a centroid that attracts no
vectors keeps its previous coordinates for the next round.

Scale shape (billions of vectors, 100 TB): per iteration the ONLY
shuffle is the k x dim partial-aggregate (map-side combine collapses
each partition to k rows of 64 sums before anything moves); centroids
are k x dim BIGINTs of driver model state (4 KiB at k=8, dim=64 —
same bounded-state budget as the IVF centroid and MMR pool
precedents), re-broadcast into the assignment expression each round.
Vectors themselves NEVER shuffle — assignment is a codegen'd
column expression inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Q_SCALE = 10**4  # lattice resolution: floor(x * 1e4)


def quantize_expr(col: str) -> Column:
    """array<float> -> array<bigint> on the shared integer lattice."""
    return F.transform(
        F.col(col),
        lambda x: F.floor(x.cast("double") * F.lit(float(Q_SCALE))),
    )


def _dist_expr(qvec: str, centroid: list[int]) -> Column:
    """Exact BIGINT squared L2 distance to one literal centroid."""
    lit = F.array(*[F.lit(int(m)) for m in centroid])
    return F.aggregate(
        F.zip_with(F.col(qvec), lit, lambda a, b: (a - b) * (a - b)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _assign_expr(qvec: str, centroids: dict[int, list[int]]) -> Column:
    """argmin over literal centroids as (dist, cid) struct min —
    struct ordering pins the lowest-cid tie-break."""
    best = F.array_min(
        F.array(
            *[
                F.struct(
                    _dist_expr(qvec, m).alias("dist"),
                    F.lit(int(cid)).alias("cid"),
                )
                for cid, m in sorted(centroids.items())
            ]
        )
    )
    return best


def kmeans_lloyd(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> DataFrame:
    """Train k centroids by ``iters`` Lloyd rounds; return the golden
    per-cluster summary (cluster_id, n_members, inertia,
    centroid_checksum) under the final assignment.

    Init: the quantized vectors of the k lowest ``id_col`` rows
    (cid = that id) — a pinned deterministic seeding, the k-means++
    slot a production run would randomize.
    """
    q = df.select(
        F.col(id_col).alias("vec_id"), quantize_expr(vec_col).alias("qv")
    # Materialize the lattice ONCE: every Lloyd round (and the final
    # summary) is an action over this frame — without the checkpoint
    # each of the iters+2 jobs re-reads parquet and re-quantizes (the
    # pagerank static-frame lesson, operators/graph.py).
    ).localCheckpoint(eager=True)
    # Bounded driver model state: k x dim BIGINTs (the IVF-centroid /
    # MMR-pool budget), refreshed once per round.
    init = q.filter(F.col("vec_id") < k).collect()
    centroids: dict[int, list[int]] = {
        int(r["vec_id"]): [int(v) for v in r["qv"]] for r in init
    }
    if len(centroids) != k:
        raise ValueError(f"need vec_id 0..{k - 1} present to seed {k} centroids")

    sums = [F.sum(F.element_at("qv", d + 1)).alias(f"s{d}") for d in range(dim)]
    for _ in range(iters):
        agg = (
            q.select("qv", _assign_expr("qv", centroids)["cid"].alias("cid"))
            .groupBy("cid")
            .agg(F.count(F.lit(1)).alias("n"), *sums)
            .collect()
        )
        new = dict(centroids)  # empty cluster keeps previous coordinates
        for r in agg:
            c = int(r["n"])
            # Python // floors toward -inf — matches the oracle's
            # FLOOR(sum/count) exactly (sums ~1e8 << 2^53, so the
            # oracle's double division is exact enough that floor
            # agrees; see module docstring magnitude audit).
            new[int(r["cid"])] = [int(r[f"s{d}"]) // c for d in range(dim)]
        centroids = new

    checksum = {
        cid: sum(m * (d + 1) for d, m in enumerate(vec))
        for cid, vec in centroids.items()
    }
    best = _assign_expr("qv", centroids)
    cks = F.map_from_arrays(
        F.array(*[F.lit(int(c)) for c in sorted(checksum)]),
        F.array(*[F.lit(int(checksum[c])) for c in sorted(checksum)]),
    )
    return (
        q.select(
            best["cid"].alias("cluster_id"), best["dist"].alias("dist")
        )
        .groupBy("cluster_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_members"),
            F.sum("dist").cast("long").alias("inertia"),
        )
        .select(
            F.col("cluster_id").cast("int").alias("cluster_id"),
            "n_members",
            "inertia",
            cks[F.col("cluster_id")].cast("long").alias("centroid_checksum"),
        )
    )


def kmeans_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """Unrolled-CTE DuckDB oracle for kmeans_lloyd: one
    assignment+update CTE pair per round over the long-format lattice
    (MATERIALIZED — chained CTE inlining is exponential otherwise, the
    k-core lesson). Identical pinned rules: floor-lattice quantization,
    (dist, cid) tie-break, floor-division centroid update, empty
    cluster carries forward."""
    parts = [
        f"""WITH qd AS MATERIALIZED (
  SELECT {id_col} AS vec_id, CAST(r.d AS INT) AS d,
         CAST(FLOOR(CAST({vec_col}[CAST(r.d AS INT)] AS DOUBLE) * {Q_SCALE}.0)
              AS BIGINT) AS x
  FROM {table}, range(1, {dim + 1}) r(d)),
c0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cid, d, x AS m FROM qd WHERE vec_id < {k}),"""
    ]
    for t_ in range(1, iters + 1):
        p = t_ - 1
        parts.append(
            f"""a{t_} AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT qd.vec_id, c.cid, SUM((qd.x - c.m) * (qd.x - c.m)) AS dist
          FROM qd JOIN c{p} c USING (d) GROUP BY qd.vec_id, c.cid))
  WHERE rn = 1),
c{t_} AS MATERIALIZED (
  SELECT a.cid, qd.d,
         CAST(FLOOR(CAST(SUM(qd.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM a{t_} a JOIN qd USING (vec_id) GROUP BY a.cid, qd.d
  UNION ALL
  SELECT cid, d, m FROM c{p}
  WHERE cid NOT IN (SELECT DISTINCT cid FROM a{t_})),"""
        )
    # Final assignment against the trained centroids + golden summary.
    parts.append(
        f"""af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT qd.vec_id, c.cid, SUM((qd.x - c.m) * (qd.x - c.m)) AS dist
          FROM qd JOIN c{iters} c USING (d) GROUP BY qd.vec_id, c.cid))
  WHERE rn = 1),
ck AS MATERIALIZED (
  SELECT cid, SUM(m * d) AS centroid_checksum FROM c{iters} GROUP BY cid)"""
    )
    body = "\n".join(parts)
    return f"""{body}
SELECT af.cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(af.dist) AS BIGINT) AS inertia,
       CAST(ANY_VALUE(ck.centroid_checksum) AS BIGINT) AS centroid_checksum
FROM af JOIN ck ON af.cid = ck.cid
GROUP BY af.cid"""

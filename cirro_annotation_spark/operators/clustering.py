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


def _dist_sql(qvec: str, centroid: list[int]) -> str:
    """SQL text of the exact BIGINT squared L2 distance to one literal
    centroid — the same aggregate(zip_with(...)) loop the Column tree
    built, emitted as ONE SQL string parsed JVM-side. Two measured
    rationales (optimization r15, guide §5 driver overhead + §1
    measure-first): (a) constructing k x dim literals through py4j
    costs one driver round-trip per node — 21 s of pure expression
    construction per PQ Lloyd round at k=4, dim=64, vs ~2 ms for the
    parse; (b) the loop form must be KEPT at runtime — flattening to
    k x dim explicit qv[i] terms ballooned generated code past JIT
    limits and ran 7x slower (4.6 s vs 0.26 s on the k=8, dim=64
    probe). Identical integer arithmetic either way (left-to-right
    BIGINT fold)."""
    arr = ",".join(str(int(m)) for m in centroid)
    return (
        f"aggregate(zip_with(`{qvec}`, array({arr}), (a,b) -> (a-b)*(a-b)),"
        f" CAST(0 AS BIGINT), (acc,x) -> acc+x)"
    )


def _dist_expr(qvec: str, centroid: list[int]) -> Column:
    """Exact BIGINT squared L2 distance to one literal centroid."""
    return F.expr(_dist_sql(qvec, centroid))


def _assign_sql(qvec: str, centroids: dict[int, list[int]]) -> str:
    """SQL text of :func:`_assign_expr` (see _dist_sql for why SQL)."""
    alts = ",".join(
        f"struct({_dist_sql(qvec, m)} AS dist, {int(cid)} AS cid)"
        for cid, m in sorted(centroids.items())
    )
    return f"array_min(array({alts}))"


def _assign_expr(qvec: str, centroids: dict[int, list[int]]) -> Column:
    """argmin over literal centroids as (dist, cid) struct min —
    struct ordering pins the lowest-cid tie-break."""
    return F.expr(_assign_sql(qvec, centroids))


def int_array_map_expr(mapping: dict[int, list[int]]) -> Column:
    """``map<int, array<int>>`` literal from a {cid: vector} dict as a
    single parsed SQL expression — the broadcast-codebook lookup used
    by the residual frame and the pinned-codebook search queries. One
    JVM parse replaces |map| x dim py4j literal constructions (same
    rationale as _dist_sql)."""
    entries = ",".join(
        f"{int(k)},array({','.join(str(int(v)) for v in vec)})"
        for k, vec in sorted(mapping.items())
    )
    return F.expr(f"map({entries})")


def kmeans_fit(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
):
    """Run the Lloyd rounds; return (centroids, q) — the trained
    k x dim integer codebook (driver model state) and the materialized
    quantized lattice frame (vec_id, qv). Consumers: kmeans_lloyd (the
    golden summary) and the prototype-pruning query (per-vector
    assignment ranks).

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
    return fit_lattice(q, k, iters, dim), q


def fit_lattice(q: DataFrame, k: int, iters: int, dim: int):
    """Lloyd rounds over an ALREADY-integer (vec_id, qv) lattice frame
    (callers checkpoint it). Factored from kmeans_fit so the residual
    quantizer can train its second stage on integer residual vectors
    under the identical determinism contract."""
    # Bounded driver model state: k x dim BIGINTs (the IVF-centroid /
    # MMR-pool budget), refreshed once per round. Seeds are the k
    # LOWEST ids PRESENT (not literally 0..k-1): deterministic for any
    # fixture id-space — the kcore-vacuity lesson applied prophylactically
    # (a regenerated corpus with shifted ids must not error out).
    init = q.orderBy("vec_id").limit(k).collect()
    centroids: dict[int, list[int]] = {
        int(r["vec_id"]): [int(v) for v in r["qv"]] for r in init
    }
    if len(centroids) != k:
        raise ValueError(f"need >= {k} vectors to seed {k} centroids")

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
    return centroids


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
    centroid_checksum) under the final assignment (golden_summary —
    shared with rq_train)."""
    centroids, q = kmeans_fit(df, vec_col, id_col, k, iters, dim)
    return golden_summary(q, centroids)


def lattice_cte(
    table: str, vec_col: str, id_col: str, dim: int, name: str = "qd"
) -> str:
    """The quantization-lattice CTE (vec_id, d, x = floor(vec[d]*Q_SCALE))
    — THE determinism anchor for this module, now written once: the same
    text previously lived as three hand-copies in the kmeans, PQ, and
    power-iteration oracle builders, where a change to the Q_SCALE
    spelling or FLOOR/CAST order had to be made three times or the
    oracles silently diverged (code-review r15). No trailing comma —
    callers join CTE lists themselves."""
    return f"""{name} AS MATERIALIZED (
  SELECT {id_col} AS vec_id, CAST(r.d AS INT) AS d,
         CAST(FLOOR(CAST({vec_col}[CAST(r.d AS INT)] AS DOUBLE) * {Q_SCALE}.0)
              AS BIGINT) AS x
  FROM {table}, range(1, {dim + 1}) r(d))"""


def lloyd_rounds_ctes(
    src: str, prefix: str, k: int, iters: int
) -> str:
    """The Lloyd-round CTE template, instantiated once per consumer
    (kmeans over the raw lattice, RQ stage 2 over residuals — review
    finding r8: three hand-copies of this template risked the pinned
    rules diverging). ``src`` is a long-format lattice CTE
    (vec_id, d, x); emits {prefix}c0 seeds, one {prefix}a{t}/{prefix}c{t}
    assignment+update pair per round, the final assignment {prefix}af
    and checksum table {prefix}ck. Pinned rules live HERE only:
    (dist, cid) tie-break, floor-division centroid update, empty
    cluster carries forward. MATERIALIZED throughout — chained CTE
    inlining is exponential otherwise, the k-core lesson."""
    parts = [
        f"""{prefix}c0 AS MATERIALIZED (
  SELECT CAST(vec_id AS INT) AS cid, d, x AS m FROM {src}
  WHERE vec_id IN (SELECT DISTINCT vec_id FROM {src} ORDER BY vec_id
                   LIMIT {k})),"""
    ]
    for t_ in range(1, iters + 1):
        p = t_ - 1
        parts.append(
            f"""{prefix}a{t_} AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT {src}.vec_id, c.cid, SUM(({src}.x - c.m) * ({src}.x - c.m)) AS dist
          FROM {src} JOIN {prefix}c{p} c USING (d) GROUP BY {src}.vec_id, c.cid))
  WHERE rn = 1),
{prefix}c{t_} AS MATERIALIZED (
  SELECT a.cid, {src}.d,
         CAST(FLOOR(CAST(SUM({src}.x) AS DOUBLE) / COUNT(*)) AS BIGINT) AS m
  FROM {prefix}a{t_} a JOIN {src} USING (vec_id) GROUP BY a.cid, {src}.d
  UNION ALL
  SELECT cid, d, m FROM {prefix}c{p}
  WHERE cid NOT IN (SELECT DISTINCT cid FROM {prefix}a{t_})),"""
        )
    parts.append(
        f"""{prefix}af AS MATERIALIZED (
  SELECT vec_id, cid, dist FROM (
    SELECT vec_id, cid, dist,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
    FROM (SELECT {src}.vec_id, c.cid, SUM(({src}.x - c.m) * ({src}.x - c.m)) AS dist
          FROM {src} JOIN {prefix}c{iters} c USING (d) GROUP BY {src}.vec_id, c.cid))
  WHERE rn = 1),
{prefix}ck AS MATERIALIZED (
  SELECT cid, SUM(m * d) AS centroid_checksum FROM {prefix}c{iters}
  GROUP BY cid)"""
    )
    return "\n".join(parts)


def kmeans_oracle_ctes(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """Unrolled-CTE chain for the Lloyd fixed point (through the final
    assignment ``af`` and checksum table ``ck``), shared by the train,
    prototype-prune, and RQ oracles: the lattice CTE plus
    lloyd_rounds_ctes (where the pinned rules live)."""
    lattice = "WITH " + lattice_cte(table, vec_col, id_col, dim) + ","
    return lattice + "\n" + lloyd_rounds_ctes("qd", "", k, iters)


def kmeans_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 3,
    dim: int = 64,
) -> str:
    """Full DuckDB oracle for kmeans_lloyd's golden summary."""
    body = kmeans_oracle_ctes(table, vec_col, id_col, k, iters, dim)
    return f"""{body}
SELECT af.cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(af.dist) AS BIGINT) AS inertia,
       CAST(ANY_VALUE(ck.centroid_checksum) AS BIGINT) AS centroid_checksum
FROM af JOIN ck ON af.cid = ck.cid
GROUP BY af.cid"""


# ---------------------------------------------------------------------------
# Product-quantization codebook training (Jegou et al. 2011) — m
# independent k-means problems, one per subspace, trained TOGETHER.
# ---------------------------------------------------------------------------
def pq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Train the m x k PQ codebook on the shared integer lattice;
    return one row per (subspace, cluster): n_members, inertia,
    centroid_checksum under the final assignment.

    The sim_topk_pq / sim_topk_ivfpq queries consume codebooks as
    pinned literals (suites/_pq_codebooks.py) — this is their producer,
    completing the IVF-PQ artifact lifecycle together with
    kmeans_lloyd (the coarse cells). Exactness is the kmeans_lloyd
    contract applied per subspace: floor-lattice, BIGINT distances,
    (dist, cid) ties, floor-division updates, empty-cluster
    carry-forward.

    Scale shape: ALL m subspaces train in the SAME single aggregate
    per round — m assignment expressions (codegen argmin over k
    literal sub-centroids each) feed m*k*(subdim+1) conditional sums,
    map-side combined to ONE row; driver model state is m*k*subdim
    BIGINTs. One pass per round over vectors that never shuffle —
    training the whole codebook costs the same passes as one subspace.
    """
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    # Same lattice + seeding contract as k-means, shared: seed
    # centroids are the k lowest-id vectors (kmeans_fit with iters=0
    # runs no Lloyd rounds and returns exactly that state).
    seeds, q = kmeans_fit(df, vec_col, id_col, k=k, iters=0, dim=dim)
    # codebook[(s, c)] = the subvector of seed c in subspace s; cids
    # are the ACTUAL seed ids (k lowest present), not assumed 0..k-1 —
    # the kmeans seeding contract.
    book: dict[tuple[int, int], list[int]] = {}
    for c, full in seeds.items():
        for s in range(m):
            book[(s, c)] = full[s * sub : (s + 1) * sub]
    cids = sorted(seeds)

    def sub_assign_sql(s: int) -> str:
        # One parsed SQL expression per subspace instead of a
        # k x subdim py4j literal tree, keeping the aggregate/zip_with
        # LOOP form at runtime (see _dist_sql for both measurements —
        # optimization r15).
        alts = ",".join(
            "struct(aggregate(zip_with("
            f"slice(qv, {s * sub + 1}, {sub}), "
            f"array({','.join(str(int(x)) for x in book[(s, c)])}), "
            "(a,b) -> (a-b)*(a-b)), CAST(0 AS BIGINT), (acc,x) -> acc+x)"
            f" AS dist, {int(c)} AS cid)"
            for c in cids
        )
        return f"array_min(array({alts}))"

    for _ in range(iters):
        # Project each subspace's argmin ONCE, then aggregate over the
        # plain columns — embedding the argmin tree inside every one of
        # the m*k*(subdim+1) conditional sums made Catalyst analyze a
        # ~70x larger expression tree (measured 14 s -> ~6 s at sf0.1).
        proj = q.selectExpr(
            "qv", *[f"{sub_assign_sql(s)}.cid AS a{s}" for s in range(m)]
        )
        aggs = []
        for s in range(m):
            for c in cids:
                aggs.append(
                    F.expr(f"SUM(IF(a{s}={int(c)},1,0))").alias(f"n_{s}_{c}")
                )
                for d in range(sub):
                    aggs.append(
                        F.expr(
                            f"SUM(IF(a{s}={int(c)},qv[{s * sub + d}],0))"
                        ).alias(f"s_{s}_{c}_{d}")
                    )
        row = proj.agg(*aggs).first()
        new = dict(book)  # empty cluster keeps previous coordinates
        for s in range(m):
            for c in cids:
                n = int(row[f"n_{s}_{c}"])
                if n:
                    new[(s, c)] = [
                        int(row[f"s_{s}_{c}_{d}"]) // n for d in range(sub)
                    ]
        book = new

    # Final assignment stats, still one aggregate: counts + inertia per
    # (subspace, cluster); checksums are driver arithmetic on the book.
    proj = q.selectExpr(
        *[f"{sub_assign_sql(s)} AS b{s}" for s in range(m)]
    )
    aggs = []
    for s in range(m):
        for c in cids:
            aggs.append(
                F.expr(f"SUM(IF(b{s}.cid={int(c)},1,0))").alias(f"n_{s}_{c}")
            )
            aggs.append(
                F.expr(f"SUM(IF(b{s}.cid={int(c)},b{s}.dist,0))").alias(
                    f"i_{s}_{c}"
                )
            )
    row = proj.agg(*aggs).first()
    out = []
    for s in range(m):
        for c in cids:
            n = int(row[f"n_{s}_{c}"])
            if n == 0:
                continue  # absent from the summary, the kmeans rule
            cks = sum(x * (d + 1) for d, x in enumerate(book[(s, c)]))
            out.append((s, c, n, int(row[f"i_{s}_{c}"]), cks))
    spark = df.sparkSession
    return spark.createDataFrame(
        out,
        "subspace int, cluster_id int, n_members long, inertia long,"
        " centroid_checksum long",
    )


def pq_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    m: int = 4,
    k: int = 4,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """Unrolled-CTE DuckDB oracle for pq_train: the kmeans_oracle_sql
    round structure instantiated once per subspace over the shared
    long-format lattice (qd restricted to each subspace's dim range)."""
    if dim % m:
        raise ValueError(f"dim={dim} not divisible by m={m} subspaces")
    sub = dim // m
    # One lattice + the SHARED Lloyd template per subspace (prefix
    # s{i}): the pinned rules — (dist, cid) tie-break, floor-division
    # update, empty-cluster carry-forward — live only in
    # lloyd_rounds_ctes; this builder previously hand-copied the whole
    # template, exactly the divergence risk that function was factored
    # out to remove (code-review r15; pure CTE renaming, values
    # identical — re-verified against the driver oracle gate).
    parts = ["WITH " + lattice_cte(table, vec_col, id_col, dim)]
    finals = []
    for s in range(m):
        lo, hi = s * sub + 1, (s + 1) * sub
        parts.append(
            f"""sq{s} AS MATERIALIZED (
  SELECT vec_id, d - {lo - 1} AS d, x FROM qd
  WHERE d BETWEEN {lo} AND {hi})"""
        )
        parts.append(lloyd_rounds_ctes(f"sq{s}", f"s{s}", k, iters))
        finals.append(
            f"""SELECT CAST({s} AS INT) AS subspace, s{s}af.cid AS cluster_id,
       CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(s{s}af.dist) AS BIGINT) AS inertia,
       CAST(ANY_VALUE(s{s}ck.centroid_checksum) AS BIGINT)
         AS centroid_checksum
FROM s{s}af JOIN s{s}ck ON s{s}af.cid = s{s}ck.cid
GROUP BY s{s}af.cid"""
        )
    body = ",\n".join(parts)
    return body + "\n" + "\nUNION ALL\n".join(finals)


# ---------------------------------------------------------------------------
# Residual quantization (Chen et al. 2010, "Approximate nearest neighbor
# search by residual vector quantization") — stage 2 trains on the
# INTEGER residuals of stage 1, so the whole two-stage artifact stays on
# the exact lattice and hash-checks end to end.
# ---------------------------------------------------------------------------
def rq_residual_frame(q: DataFrame, cent1: dict[int, list[int]]) -> DataFrame:
    """Exact integer residual lattice frame: ``qv − centroid1[assign]``
    over a (vec_id, qv) lattice frame, with the stage-1 centroid map
    broadcast as a literal. ONE definition, used by rq_train, the
    pinned-codebook regen recipe, and the staleness canary (review
    finding r8: a copied derivation in the canary would pin a copy,
    not the production path)."""
    cmap = int_array_map_expr(cent1)
    assign = _assign_expr("qv", cent1)
    return q.select(
        "vec_id",
        F.zip_with(F.col("qv"), cmap[assign["cid"]], lambda a, b: a - b).alias(
            "qv"
        ),
    ).localCheckpoint(eager=True)


def golden_summary(
    frame: DataFrame, centroids: dict[int, list[int]]
) -> DataFrame:
    """Per-cluster golden summary (cluster_id, n_members, inertia,
    centroid_checksum) of a lattice frame under the FINAL assignment
    against ``centroids`` — shared by kmeans_lloyd and rq_train so the
    checksum formula (Σ m·(d+1)) and summary shape exist once."""
    checksum = {
        cid: sum(m * (d + 1) for d, m in enumerate(vec))
        for cid, vec in centroids.items()
    }
    cks = F.map_from_arrays(
        F.array(*[F.lit(int(c)) for c in sorted(checksum)]),
        F.array(*[F.lit(int(checksum[c])) for c in sorted(checksum)]),
    )
    best = _assign_expr("qv", centroids)
    return (
        frame.select(
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


def rq_train(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> DataFrame:
    """Train a two-stage residual quantizer: coarse k-means (k1), then
    k-means (k2) over the exact integer residuals ``qv − centroid1``.
    Returns the stage-2 golden summary (cluster_id, n_members, inertia,
    centroid_checksum) under the final residual assignment — inertia
    here IS the quantization error the second stage leaves, the number
    an RQ deployment watches against its PQ/IVF-PQ alternatives.

    Determinism: residual subtraction is exact BIGINT arithmetic on the
    shared lattice (no re-quantization between stages — the property
    that makes a two-stage integer fixed point possible at all); both
    stages inherit kmeans_fit's pinned tie/empty-cluster/floor rules.

    Scale shape: two kmeans trainings back to back — per round one
    k×dim partial aggregate; the residual frame derives map-side from
    the checkpointed lattice (centroid map broadcast as a literal) and
    is checkpointed once, so stage 2 never re-reads parquet. Vectors
    never shuffle in either stage.
    """
    cent1, q = kmeans_fit(df, vec_col, id_col, k1, iters, dim)
    resid = rq_residual_frame(q, cent1)
    cent2 = fit_lattice(resid, k2, iters, dim)
    return golden_summary(resid, cent2)


def rq_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k1: int = 8,
    k2: int = 8,
    iters: int = 2,
    dim: int = 64,
) -> str:
    """Unrolled-CTE oracle for rq_train: the stage-1 kmeans chain
    (through its final assignment ``af``), an exact integer residual
    CTE, then a SECOND instantiation of the shared Lloyd-round template
    (lloyd_rounds_ctes — the pinned rules exist once) over the residual
    lattice."""
    stage1 = kmeans_oracle_ctes(table, vec_col, id_col, k1, iters, dim)
    residual = f""",
rd AS MATERIALIZED (
  SELECT qd.vec_id, qd.d, qd.x - cm.m AS x
  FROM qd JOIN af USING (vec_id)
  JOIN c{iters} cm ON af.cid = cm.cid AND qd.d = cm.d),
"""
    stage2 = lloyd_rounds_ctes("rd", "r", k2, iters)
    final = """
SELECT raf.cid AS cluster_id, CAST(COUNT(*) AS BIGINT) AS n_members,
       CAST(SUM(raf.dist) AS BIGINT) AS inertia,
       CAST(ANY_VALUE(rck.centroid_checksum) AS BIGINT) AS centroid_checksum
FROM raf JOIN rck ON raf.cid = rck.cid
GROUP BY raf.cid"""
    return stage1 + residual + stage2 + final


# ---------------------------------------------------------------------------
# Greedy k-center coreset selection (Gonzalez 1985 farthest-first
# traversal) — the SELECTION member of the training family: kmeans/PQ/RQ
# compress the corpus toward its density; k-center picks the k points
# that COVER it (2-approximation of the optimal covering radius), the
# standard coreset seed for active learning and diverse sampling.
# ---------------------------------------------------------------------------
def kcenter_greedy(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
) -> DataFrame:
    """Farthest-first traversal on the shared integer lattice.

    Start = lowest id (pinned, deterministic); each round picks the
    point with the LARGEST exact BIGINT squared distance to its nearest
    chosen center (ties -> lowest id) and reports that distance — the
    monotone nonincreasing k-center radius progression.

    Scale shape: inherently k passes (the greedy is sequential by
    definition) but each pass is one codegen'd min-distance update in
    the scan stage plus a TakeOrderedAndProject(1) — no shuffle of the
    vectors, ever; chosen centers are k x dim BIGINTs of bounded driver
    model state, the kmeans_lloyd budget.
    """
    qd = df.select(
        F.col(id_col).alias("vec_id"), quantize_expr(vec_col).alias("qv")
    )
    head = qd.orderBy(F.col("vec_id").asc()).limit(1).collect()
    schema = "sel_rank bigint, vec_id bigint, radius_d2 bigint"
    if not head:  # empty input: typed empty result
        return df.sparkSession.createDataFrame([], schema)
    first = head[0]
    sel: list[tuple[int, int, int]] = [(1, int(first["vec_id"]), 0)]
    cvec = [int(v) for v in first["qv"]]
    # Checkpoint the running min-distance each round: without it the
    # lineage re-evaluates EVERY prior center's distance expression
    # per round (O(k^2) distance evals/row — measured 141 s vs ~35 s
    # at the 100x tier); materialized, each round computes exactly one
    # new distance and one least().
    cur = qd.withColumn("mind", _dist_expr("qv", cvec)).localCheckpoint(
        eager=False
    )
    for r in range(2, k + 1):
        tops = (
            cur.orderBy(F.col("mind").desc(), F.col("vec_id").asc())
            .limit(1)
            .collect()
        )
        if not tops:
            break
        top = tops[0]
        if int(top["mind"]) == 0:
            # Coverage is complete (k exceeds the number of distinct
            # vectors): every further pick would duplicate a center.
            break
        sel.append((r, int(top["vec_id"]), int(top["mind"])))
        cvec = [int(v) for v in top["qv"]]
        cur = cur.withColumn(
            "mind", F.least(F.col("mind"), _dist_expr("qv", cvec))
        ).localCheckpoint(eager=False)
    return df.sparkSession.createDataFrame(sel, schema)


def kcenter_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    dim: int = 64,
) -> str:
    """Unrolled DuckDB oracle: k-1 rounds of (distance to newest center,
    running least, argmax with id tie-break), the kmeans unrolled-CTE
    standard applied to the farthest-first recursion.

    Early-stop mirror (ADVICE r10): kcenter_greedy breaks when the max
    min-distance hits 0 (coverage complete — k exceeded the distinct
    lattice points). Each round's argmax CTE therefore carries
    ``WHERE mind > 0``: a zero-radius round yields no row, and the
    CROSS JOIN chain cascades empty for every later round — exactly
    the Spark break, so the two sides agree even when quantization
    collapses distinct embeddings onto one lattice point."""
    d2 = (
        f"CAST(list_sum(list_transform(range(1, {dim + 1}), "
        "i -> (m.qv[i] - c.qv[i]) * (m.qv[i] - c.qv[i]))) AS BIGINT)"
    )
    parts = [
        f"""WITH qd AS (
  SELECT {id_col} AS vec_id,
         list_transform(CAST({vec_col} AS DOUBLE[]),
                        x -> CAST(FLOOR(x * {float(Q_SCALE)}) AS BIGINT)) AS qv
  FROM {table}),
c1 AS (SELECT vec_id, qv FROM qd ORDER BY vec_id ASC LIMIT 1),
m1 AS (
  SELECT m.vec_id, m.qv, {d2} AS mind
  FROM qd m CROSS JOIN c1 c)"""
    ]
    for r in range(2, k + 1):
        parts.append(
            f"""c{r} AS (
  SELECT vec_id, qv, mind FROM m{r - 1}
  WHERE mind > 0
  ORDER BY mind DESC, vec_id ASC LIMIT 1)"""
        )
        if r < k:
            parts.append(
                f"""m{r} AS (
  SELECT m.vec_id, m.qv, LEAST(m.mind, {d2}) AS mind
  FROM m{r - 1} m CROSS JOIN c{r} c)"""
            )
    rows = ["SELECT CAST(1 AS BIGINT) AS sel_rank, vec_id, CAST(0 AS BIGINT) AS radius_d2 FROM c1"]
    for r in range(2, k + 1):
        rows.append(
            f"SELECT CAST({r} AS BIGINT), vec_id, CAST(mind AS BIGINT) FROM c{r}"
        )
    return ",\n".join(parts) + "\n" + "\nUNION ALL\n".join(rows)


# ---------------------------------------------------------------------------
# Power iteration (dominant eigenvector) — the SPECTRAL member of the
# trainer family (k-means/PQ/RQ quantize, k-center selects, this one
# finds the principal direction used for whitening / ABTT
# mean-direction removal in embedding pipelines).
# ---------------------------------------------------------------------------
def power_iteration(
    df,
    vec_col: str,
    id_col: str,
    dim: int = 64,
    iters: int = 6,
    v_scale: int = 1024,
):
    """Dominant eigenvector of the mean outer-product matrix
    C̄ = floor(XᵀX / n), by ``iters`` rounds of L∞-normalized power
    iteration on the shared integer lattice — engine-exact, so the full
    iterative result hash-matches an unrolled-CTE DuckDB twin
    (:func:`power_iteration_oracle_sql`).

    Exactness: the L∞ renormalization ``v' = (C̄·v · v_scale) div
    max|C̄·v|`` needs no sqrt and no float — truncating BIGINT division
    agrees across engines for either sign (the Holt-Winters signed-div
    rule). v₀ = uniform +v_scale makes the sign convention and the
    whole sequence deterministic.

    Overflow audit (n-INDEPENDENT — the mean outer product is the 100 TB
    dial): |x| <= Q_SCALE·max|emb| (~5.8e3 here), C̄ entry <= x² ~ 3.3e7,
    |C̄·v| <= dim·C̄·v_scale ~ 2.2e12, each product <= 3.4e10 — all far
    inside BIGINT for ANY corpus size, because C̄ divides by n before
    the iteration.

    Scale shape: the ONE data-sized term is the dim²-cell Gram
    aggregate (map-side combined; vectors never shuffle — (vec_id, d,
    x) triples do). The iteration runs on dim² + dim model-frame rows;
    each round is two tiny joins + one 1-row broadcast max, lazily
    checkpointed so lineage doesn't recompute (the k-center lesson).
    """
    n1 = df.select(F.count(F.lit(1)).cast("long").alias("n"))
    # The Gram matrix is symmetric: generate ONLY the upper triangle,
    # and do it SCAN-LOCALLY — a nested posexplode over array slices
    # (x1 paired with qv[d1:]) emits the dim·(dim+1)/2 products per
    # vector with NO self-join and no vec_id shuffle at all; the only
    # exchange left is the (d1, d2) partial aggregate. The strict half
    # mirrors afterwards on the 2080-cell model frame.
    e1 = df.select(
        F.col(id_col).alias("vec_id"),
        quantize_expr(vec_col).alias("__qv"),
    ).select(
        "vec_id",
        "__qv",
        F.posexplode("__qv").alias("p1", "x1"),
    )
    e2 = e1.select(
        (F.col("p1") + 1).alias("d1"),
        F.col("x1").cast("long").alias("x1"),
        F.posexplode(
            F.slice(F.col("__qv"), F.col("p1") + 1, F.lit(dim))
        ).alias("p2off", "x2"),
    )
    half = (
        e2.select(
            "d1",
            (F.col("d1") + F.col("p2off")).alias("d2"),
            (F.col("x1") * F.col("x2").cast("long")).alias("prod"),
        )
        .groupBy("d1", "d2")
        .agg(F.sum("prod").alias("s"))
        .join(F.broadcast(n1))
        .select("d1", "d2", F.expr("s div n").alias("c"))
        # the mirror union below reads this frame twice — checkpoint
        # HERE so the data-sized aggregate runs once
        .localCheckpoint(eager=False)
    )
    c = half.unionByName(
        half.filter(F.col("d1") < F.col("d2")).select(
            F.col("d2").alias("d1"), F.col("d1").alias("d2"), "c"
        )
    )
    v = c.select(F.col("d1").alias("d")).distinct().select(
        "d", F.lit(int(v_scale)).cast("long").alias("v")
    )
    for _ in range(iters):
        w = (
            c.join(v.select(F.col("d").alias("d2"), "v"), "d2")
            .groupBy("d1")
            .agg(F.sum(F.col("c") * F.col("v")).alias("w"))
        )
        m = w.select(F.max(F.abs(F.col("w"))).alias("m"))
        v = (
            w.join(F.broadcast(m))
            .select(
                F.col("d1").alias("d"),
                F.expr(f"(w * {int(v_scale)}) div m").alias("v"),
            )
            .localCheckpoint(eager=False)
        )
    return v.select(F.col("d").cast("int").alias("d"), "v")


def power_iteration_oracle_sql(
    table: str = "embeddings",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    dim: int = 64,
    iters: int = 6,
    v_scale: int = 1024,
) -> str:
    """Unrolled-CTE DuckDB twin of :func:`power_iteration`: the lattice
    CTE, the floored mean Gram matrix, then one (w, m, v) CTE triple per
    round — same truncating-division arithmetic."""
    parts = [
        "WITH "
        + lattice_cte(table, vec_col, id_col, dim)
        + f""",
nn AS (SELECT COUNT(DISTINCT vec_id) AS n FROM qd),
cm AS MATERIALIZED (
  SELECT a.d AS d1, b.d AS d2, SUM(a.x * b.x) // MAX(nn.n) AS c
  FROM qd a JOIN qd b USING (vec_id) CROSS JOIN nn GROUP BY a.d, b.d),
v0 AS (SELECT d, CAST({v_scale} AS BIGINT) AS v
       FROM range(1, {dim + 1}) r(d))"""
    ]
    for i in range(1, iters + 1):
        parts.append(
            f"""w{i} AS (SELECT cm.d1 AS d, SUM(cm.c * v{i-1}.v) AS w
       FROM cm JOIN v{i-1} ON cm.d2 = v{i-1}.d GROUP BY cm.d1),
m{i} AS (SELECT MAX(ABS(w)) AS m FROM w{i}),
v{i} AS (SELECT d, (w * {v_scale}) // m AS v FROM w{i} CROSS JOIN m{i})"""
        )
    return (
        ",\n".join(parts)
        + f"\nSELECT CAST(d AS INT) AS d, CAST(v AS BIGINT) AS v FROM v{iters}"
    )

"""Adversarial hot-cell tier for sim_semantic_dedup (VERDICT r7 item 2's
done-condition): a corpus where ONE quantizer cell holds ~50% of all
vectors and that cell is a clone cloud — the real-corpus shape (a
template page embedded millions of times) that makes exact within-cell
pairing quadratic, AND the shape geometric sub-quantization cannot fix
(clones share every hyperplane sign bit, so a second banding stage
leaves the hot cell intact; the id-rank chunking cap is why the bounded
operator survives it).

Build: N vectors (default 200_000 = 100× the sf0.1 embeddings table),
deterministic (Spark hash of (id, dim), no RNG). Even ids are clones of
pinned centroid 3 + 1e-3 noise (the hot cell, all true duplicates);
odd ids scatter across all 8 pinned cells with 0.3 noise (the diverse
background). Cell assignment is verified against the operator's own
argmin so the measured skew is the skew the pair stage actually sees.

Measured quantities:
- exact pair count: Σ_cell C(occ, 2) (closed form from occupancies) —
  the all-pairs blow-up the round-7 verdict flagged at 49.3 s/100×;
- capped pair count: Σ_cell [within-chunk C(cap,2)·chunks + chunk-0
  cross cap·(occ-cap)] — the bounded operator's actual BLAS input;
- end-to-end wall of semantic_dedup_removed_capped at full N, plus the
  exact Arrow twin at a gated lower tier for the trend line.

Asserts: pair-count reduction ≥ 10×, and the chunk-0 chain keeps the
clone cloud's semantics — every hot-cell member except the global
minimum id is removed, and every one reports that minimum as keeper_id
(the property geometric banding would break).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

CAP = 1024
THRESHOLD = 0.43
HOT_CELL = 3


def build(spark, n: int):
    from cirro_annotation_spark.suites._ivf_centroids import CENTROIDS

    dim = len(CENTROIDS[0])
    cmat = F.array(
        *[F.array(*[F.lit(float(x)) for x in c]) for c in CENTROIDS]
    )
    is_hot = F.col("id") % 2 == 0
    cell_target = F.when(is_hot, F.lit(HOT_CELL)).otherwise(
        (F.col("id") / 2).cast("long") % len(CENTROIDS)
    )
    eps = F.when(is_hot, F.lit(1e-3)).otherwise(F.lit(0.3))
    base = F.element_at(cmat, (cell_target + 1).cast("int"))
    # noise_j in [-0.5, 0.5): deterministic per (id, j) via Spark hash
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda j: F.element_at(base, (j + 1).cast("int"))
        + eps * (F.pmod(F.hash(F.col("id"), j), F.lit(1000)) / 1000.0 - 0.5),
    )
    return (
        spark.range(n)
        .select(
            F.col("id").alias("vec_id"),
            vec.cast("array<float>").alias("embedding"),
            F.lit(0).alias("label"),
        )
        .localCheckpoint(eager=True)
    )


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000

    from cirro_annotation_spark.operators import similarity as S
    from cirro_annotation_spark.session import get_spark
    from cirro_annotation_spark.suites._ivf_centroids import CENTROIDS

    spark = get_spark("scale-semdedup-skew")
    emb = build(spark, n)

    v = F.col("embedding").cast("array<double>")
    occ = (
        emb.select(S._argmin_centroid(v, CENTROIDS).alias("cell"))
        .groupBy("cell")
        .count()
        .collect()
    )
    occs = {r["cell"]: r["count"] for r in occ}
    hot = max(occs.values())
    assert occs[HOT_CELL] == hot and hot >= n // 2, occs
    print(f"{n} vectors, occupancy per cell: {dict(sorted(occs.items()))}")
    print(f"hot cell {HOT_CELL} holds {hot/n:.0%} of the corpus")

    exact_pairs = sum(c * (c - 1) // 2 for c in occs.values())
    capped_pairs = 0
    for c in occs.values():
        full, rem = divmod(c, CAP)
        capped_pairs += full * (CAP * (CAP - 1) // 2) + rem * (rem - 1) // 2
        capped_pairs += CAP * (c - CAP) if c > CAP else 0
    ratio = exact_pairs / max(capped_pairs, 1)
    print(
        f"pair-stage candidates: exact {exact_pairs:,} vs capped "
        f"{capped_pairs:,} ({ratio:.0f}x reduction)"
    )
    assert ratio >= 10, ratio

    t0 = time.perf_counter()
    removed = S.semantic_dedup_removed_capped(
        emb, "embedding", "vec_id", CENTROIDS, THRESHOLD, cap=CAP
    ).localCheckpoint(eager=True)
    n_removed = removed.count()
    wall = time.perf_counter() - t0
    print(f"capped semdedup at {n}: {n_removed} removed in {wall:.1f} s")

    # Chunk-0 chain semantics on the clone cloud (the EVEN ids; the hot
    # cell also holds diverse odd-id background vectors that may
    # legitimately survive): every clone except global-minimum id 0 must
    # be removed, and every one must name id 0 as keeper — vec_id 0 is
    # in chunk 0 of its cell, so the chain reaches all chunks.
    clone_rows = removed.filter(
        (F.col("cell") == HOT_CELL) & (F.col("vec_id") % 2 == 0)
    )
    n_clones_removed = clone_rows.count()
    keepers = [
        r[0] for r in clone_rows.select("keeper_id").distinct().collect()
    ]
    n_clones = n // 2
    assert n_clones_removed == n_clones - 1, (n_clones_removed, n_clones)
    assert keepers == [0], keepers
    print(
        f"clone-cloud chain intact: {n_clones_removed} of {n_clones} clones "
        f"removed, keeper_id uniformly 0"
    )

    # Exact Arrow twin at a gated tier for the trend line (all-pairs on
    # the hot cell; unbounded at full N by construction).
    n_gate = min(n, 20_000)
    emb_small = build(spark, n_gate)
    t0 = time.perf_counter()
    S.semantic_dedup_removed_arrow(
        emb_small, "embedding", "vec_id", CENTROIDS, THRESHOLD
    ).write.format("noop").mode("overwrite").save()
    print(
        f"exact arrow twin at gated {n_gate}: "
        f"{time.perf_counter() - t0:.1f} s (quadratic trend)"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

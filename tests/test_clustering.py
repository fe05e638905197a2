"""k-means Lloyd training (operators/clustering.py) semantics tests —
crafted fixtures pin the rules the oracle hash-match then proves at
corpus scale: lattice quantization, argmin tie-break, floor-division
update, empty-cluster carry-forward, and actual convergence."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from cirro_annotation_spark.operators.clustering import (
    kmeans_lloyd,
    kmeans_oracle_sql,
)


def _emb_df(spark, rows):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )


def _write(tmp, df):
    df.toPandas().to_parquet(os.path.join(tmp, "embeddings.parquet"))


def test_two_obvious_clusters_resolve(spark):
    # vec 0 and 1 seed the two centroids; points pile around 0.0 and 1.0.
    rows = [(0, [0.0, 0.0]), (1, [1.0, 1.0])] + [
        (i, [0.01 * (i % 3), 0.01 * (i % 3)]) for i in range(2, 8)
    ] + [(i, [1.0 - 0.01 * (i % 3), 1.0] ) for i in range(8, 14)]
    out = {
        r["cluster_id"]: r["n_members"]
        for r in kmeans_lloyd(_emb_df(spark, rows), k=2, iters=3, dim=2).collect()
    }
    assert out == {0: 7, 1: 7}


def test_argmin_tie_breaks_to_lowest_cid(spark):
    # Point at 0.5 is equidistant from centroids 0.0 and 1.0 on the
    # lattice — the (dist, cid) struct ordering must pick cid 0.
    rows = [(0, [0.0]), (1, [1.0]), (2, [0.5])]
    out = kmeans_lloyd(_emb_df(spark, rows), k=2, iters=1, dim=1).collect()
    got = {r["cluster_id"]: r["n_members"] for r in out}
    # after round 1: c0 = mean(0.0, 0.5) on lattice = 2500, c1 = 10000;
    # final assignment: vec0,vec2 -> c0, vec1 -> c1
    assert got == {0: 2, 1: 1}


def test_empty_cluster_keeps_coordinates(spark):
    # Centroid 1 (at 100.0) attracts nothing once every point sits at
    # ~0; its checksum must still reflect the INITIAL coordinates after
    # 3 rounds (carry-forward), and it owns zero final members (absent
    # from the summary — groupBy semantics, same as the oracle's join).
    rows = [(0, [0.0]), (1, [100.0])] + [(i, [0.001 * i]) for i in range(2, 10)]
    out = kmeans_lloyd(_emb_df(spark, rows), k=2, iters=3, dim=1).collect()
    by_cid = {r["cluster_id"]: r for r in out}
    assert by_cid[1]["n_members"] == 1  # only its own seed point
    assert by_cid[1]["centroid_checksum"] == 100 * 10**4
    assert by_cid[0]["n_members"] == 9


def test_floor_lattice_handles_negatives(spark):
    # Values chosen exactly representable in float32 (halves of powers
    # of two) so the lattice points are hand-checkable: floor division
    # of the NEGATIVE sum must floor toward -inf on BOTH the driver
    # (Python //) and the oracle (FLOOR(sum/count)).
    rows = [(0, [-0.125]), (1, [0.5]), (2, [-0.25]), (3, [-0.0625])]
    out = kmeans_lloyd(_emb_df(spark, rows), k=2, iters=2, dim=1).collect()
    by_cid = {r["cluster_id"]: r for r in out}
    # cluster 0 collects lattice {-1250, -2500, -625}: sum = -4375,
    # floor(-4375 / 3) = -1459 (toward -inf, NOT -1458)
    assert by_cid[0]["centroid_checksum"] == -1459
    assert by_cid[0]["n_members"] == 3


def test_oracle_matches_engine_on_crafted_corpus(spark):
    """Full engine-vs-oracle parity on a fixture with ties, negatives,
    and an empty cluster — the degenerate cases sf fixtures may miss."""
    import duckdb

    rows = [(0, [0.0, 0.5]), (1, [100.0, -3.0]), (2, [0.5, 0.5]),
            (3, [-0.25, 0.125]), (4, [0.0, 0.0]), (5, [0.1, 0.2])]
    df = _emb_df(spark, rows)
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, df)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{os.path.join(tmp, 'embeddings.parquet')}'"
        )
        want = {
            tuple(r)
            for r in con.execute(
                "WITH " + kmeans_oracle_sql(k=2, iters=3, dim=2).removeprefix("WITH ")
            ).fetchall()
        }
        got = {
            (r["cluster_id"], r["n_members"], r["inertia"], r["centroid_checksum"])
            for r in kmeans_lloyd(df, k=2, iters=3, dim=2).collect()
        }
    assert got == want and len(got) == 2


def test_inertia_non_increasing_across_rounds(spark):
    """Lloyd's monotone-improvement property survives the lattice: on
    the real sf0.001 fixture, total inertia after 3 rounds <= after 1
    (floor-quantized centroids move by < 1 lattice unit from the true
    mean, which cannot overcome a full round's improvement here)."""
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "embeddings.parquet")):
        pytest.skip("sf0.001 fixtures absent")
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    i1 = kmeans_lloyd(emb, k=8, iters=1, dim=64).agg(F.sum("inertia")).first()[0]
    i3 = kmeans_lloyd(emb, k=8, iters=3, dim=64).agg(F.sum("inertia")).first()[0]
    assert i3 <= i1


def test_pq_train_matches_oracle_on_crafted_corpus(spark):
    """Engine-vs-oracle parity for PQ training on a toy table with an
    empty sub-cluster and negative values; also pins that subspaces
    train independently (subspace 1's clusters differ from 0's)."""
    import duckdb

    from cirro_annotation_spark.operators.clustering import (
        pq_oracle_sql,
        pq_train,
    )

    rows = [
        (0, [0.0, 0.0, 1.0, 1.0]),
        (1, [1.0, 1.0, 1.0, 1.0]),
        (2, [0.1, 0.1, 1.1, 0.9]),
        (3, [-0.5, 0.9, 0.0, 0.0]),
        (4, [0.9, 1.1, 0.1, -0.1]),
        (5, [0.0, 0.1, 1.0, 1.1]),
    ]
    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in rows],
        "vec_id long, embedding array<float>",
    )
    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, df)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{os.path.join(tmp, 'embeddings.parquet')}'"
        )
        want = set(map(tuple, con.execute(
            pq_oracle_sql(m=2, k=2, iters=2, dim=4)
        ).fetchall()))
    got = {
        (r["subspace"], r["cluster_id"], r["n_members"], r["inertia"],
         r["centroid_checksum"])
        for r in pq_train(df, m=2, k=2, iters=2, dim=4).collect()
    }
    assert got == want and len({s for s, *_ in got}) == 2
    # different assignment structure per subspace on this fixture
    n_by_sub = {}
    for s, c, n, *_ in sorted(got):
        n_by_sub.setdefault(s, []).append(n)
    assert n_by_sub[0] != n_by_sub[1]


def test_prototype_prune_marks_20pct_per_cluster(spark):
    """Pruning rule semantics on the sf0.001 fixture: per cluster,
    exactly floor(n/5) vectors are pruned (5*rank <= n), they are the
    LOWEST-distance ones, and cluster seeds (distance 0 to their own
    init centroid is not guaranteed after 3 rounds) follow the same
    rule as everyone else."""
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = QUERIES["embeddings_prototype_prune"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    by_c = {}
    for r in rows:
        by_c.setdefault(r["cluster_id"], []).append(r)
    n_vecs = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).count()
    assert sum(len(v) for v in by_c.values()) == n_vecs
    for c, members in by_c.items():
        n = len(members)
        pruned = [r for r in members if r["pruned"]]
        assert len(pruned) == n // 5
        max_pruned_dist = max((r["dist"] for r in pruned), default=-1)
        kept_min = min(r["dist"] for r in members if not r["pruned"])
        assert max_pruned_dist <= kept_min


def test_training_seeds_from_lowest_present_ids(spark):
    """Regenerated-fixture resilience (the kcore-vacuity class,
    prophylactically): a corpus whose vec_ids start at 1000 must train
    identically to the same corpus with 0-based ids — for BOTH kmeans
    and PQ, engine AND oracle."""
    import duckdb

    from cirro_annotation_spark.operators.clustering import (
        kmeans_lloyd,
        pq_oracle_sql,
        pq_train,
    )

    rows = [(i, [0.25 * (i % 4), -0.5 * (i % 3), 1.0, 0.125 * i])
            for i in range(10)]
    base = _emb_df(spark, rows)
    shifted = _emb_df(spark, [(i + 1000, v) for i, v in rows])

    km0 = {(r["n_members"], r["inertia"], r["centroid_checksum"])
           for r in kmeans_lloyd(base, k=2, iters=2, dim=4).collect()}
    km1 = {(r["n_members"], r["inertia"], r["centroid_checksum"])
           for r in kmeans_lloyd(shifted, k=2, iters=2, dim=4).collect()}
    assert km0 == km1  # ids shift, geometry (members/inertia/centroids) doesn't

    with tempfile.TemporaryDirectory() as tmp:
        _write(tmp, shifted)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM "
            f"'{os.path.join(tmp, 'embeddings.parquet')}'"
        )
        want = set(map(tuple, con.execute(
            pq_oracle_sql(m=2, k=2, iters=2, dim=4)
        ).fetchall()))
    got = {
        (r["subspace"], r["cluster_id"], r["n_members"], r["inertia"],
         r["centroid_checksum"])
        for r in pq_train(shifted, m=2, k=2, iters=2, dim=4).collect()
    }
    assert got == want and len(got) >= 2
    assert all(c >= 1000 for _, c, *_ in got)  # cids are ACTUAL ids


def test_kcenter_radius_monotone_and_distinct(spark, sf_dir):
    """Farthest-first invariants: covering radius never increases as
    centers are added, chosen ids are distinct, and the pinned start is
    the lowest vec_id."""
    from cirro_annotation_spark.operators.clustering import kcenter_greedy
    from cirro_annotation_spark.suites.util import t

    emb = t(spark, sf_dir, "embeddings")
    rows = sorted(
        kcenter_greedy(emb, k=6).collect(), key=lambda r: r["sel_rank"]
    )
    assert len(rows) == 6
    assert rows[0]["radius_d2"] == 0
    min_id = emb.agg({"vec_id": "min"}).collect()[0][0]
    assert rows[0]["vec_id"] == min_id
    ids = [r["vec_id"] for r in rows]
    assert len(set(ids)) == 6
    radii = [r["radius_d2"] for r in rows[1:]]
    assert all(a >= b for a, b in zip(radii, radii[1:]))
    assert all(r > 0 for r in radii)


def test_kcenter_small_corpus_stops_at_coverage(spark):
    """k larger than the number of distinct vectors: selection stops
    when the covering radius hits zero instead of emitting duplicate
    centers; an empty frame returns a typed empty result."""
    from cirro_annotation_spark.operators.clustering import kcenter_greedy

    df = spark.createDataFrame(
        [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    rows = kcenter_greedy(df, k=6).collect()
    assert len(rows) == 3
    assert sorted(r["vec_id"] for r in rows) == [1, 2, 3]

    empty = kcenter_greedy(df.limit(0), k=4)
    assert empty.count() == 0
    assert [f.name for f in empty.schema.fields] == [
        "sel_rank", "vec_id", "radius_d2",
    ]

def test_kcenter_oracle_mirrors_early_stop(spark):
    """ADVICE r10: the unrolled DuckDB oracle must stop at full
    coverage exactly like kcenter_greedy — with k > distinct lattice
    points, both sides emit the same (rank, id, radius) rows and no
    duplicate zero-radius centers."""
    import duckdb

    from cirro_annotation_spark.operators.clustering import (
        kcenter_greedy,
        kcenter_oracle_sql,
    )

    rows = [(1, [0.0, 0.0]), (2, [1.0, 0.0]), (3, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = sorted(
        (r["sel_rank"], r["vec_id"], r["radius_d2"])
        for r in kcenter_greedy(df, k=6, vec_col="embedding").collect()
    )

    con = duckdb.connect()
    con.execute(
        "CREATE TABLE embeddings AS SELECT * FROM (VALUES "
        + ", ".join(
            f"({i}, [{v[0]}::DOUBLE, {v[1]}::DOUBLE])" for i, v in rows
        )
        + ") t(vec_id, embedding)"
    )
    want = sorted(
        tuple(r)
        for r in con.execute(
            kcenter_oracle_sql(k=6, dim=2)
        ).fetchall()
    )
    assert got == want
    assert len(got) == 3  # coverage complete at 3 distinct points


def test_power_iteration_finds_dominant_direction(spark):
    """Synthetic anisotropic cloud: variance along dim 1 is ~25x any
    other dim, so after 6 rounds the L-inf-normalized vector must peak
    at dim 1 (|v| = 1024 there) with every other component small."""
    from cirro_annotation_spark.operators.clustering import power_iteration

    rows = []
    for i in range(200):
        main = 0.5 if i % 2 == 0 else -0.5
        vec = [main] + [((i * j) % 7 - 3) / 100.0 for j in range(1, 8)]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    v = {r["d"]: r["v"] for r in power_iteration(
        df, "embedding", "vec_id", dim=8, iters=6
    ).collect()}
    assert len(v) == 8
    assert abs(v[1]) == 1024, v
    assert all(abs(v[d]) < 300 for d in range(2, 9)), v

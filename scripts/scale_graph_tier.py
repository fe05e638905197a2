"""Pressure-test the iterative graph family at a ≥1M-edge synthetic tier
(VERDICT r6 item 5) — kcore / triangles / BFS / PageRank with KNOWN
closed-form answers, so correctness at scale is a zero-mismatch
assertion, not an oracle run (the scale_cc_graph.py discipline).

Shapes:
- CLIQUES+PENDANTS: K disjoint 8-cliques, each with a 2-node pendant
  chain off its base node. Closed forms: every clique node closes
  C(7,2)=21 triangles; the 7-core is exactly the clique nodes (pendants
  peel in round 1, all simultaneously); BFS from a base node reaches
  its 7 clique peers + pendant1 at dist 1, pendant2 at dist 2.
  K=30_000 -> 240k clique nodes, 900k undirected edges.
- RINGS (directed): R rings of size S, each node -> next. Every node
  has outdeg 1 / indeg 1, so by symmetry integer fixed-point PageRank
  assigns every node the IDENTICAL score each round -> assert exactly
  one distinct pr value. R=50_000, S=8 -> 400k nodes/edges.

The point is per-round cost honesty at 1M+ edges: work must SHRINK per
peel round, the triangle intersection must never leave its stage, the
BFS frontier join must stay proportional to the wave, and PageRank's
per-round plan must stay flat (localCheckpoint lineage truncation).

Usage: python scripts/scale_graph_tier.py [K] [R]    # default 30000 50000
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    k_cliques = int(sys.argv[1]) if len(sys.argv) > 1 else 30_000
    n_rings = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    c = 8          # clique size
    ring_s = 8     # ring size

    from cirro_annotation_spark.session import get_spark
    from cirro_annotation_spark.operators.graph import (
        bfs_hops,
        kcore_peel,
        pagerank_fixed_point,
        triangle_count_per_node,
    )

    spark = get_spark("scale-graph")

    # ---- build K cliques of size c, ids [g*10, g*10+c), pendant chain
    # at g*10+8, g*10+9 hanging off base node g*10 ----
    base = spark.range(k_cliques).select((F.col("id") * 10).alias("g"))
    pairs = [(i, j) for i in range(c) for j in range(i + 1, c)]
    clique_edges = base.select(
        F.explode(
            F.array(*[
                F.struct(
                    (F.col("g") + i).alias("src"), (F.col("g") + j).alias("dst")
                )
                for i, j in pairs
            ])
        ).alias("e")
    ).select("e.src", "e.dst")
    pendant_edges = base.select(
        F.explode(
            F.array(
                F.struct(F.col("g").alias("src"), (F.col("g") + 8).alias("dst")),
                F.struct((F.col("g") + 8).alias("src"), (F.col("g") + 9).alias("dst")),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    edges = clique_edges.unionByName(pendant_edges).localCheckpoint(eager=True)
    m = edges.count()
    n_clique_nodes = k_cliques * c
    print(f"cliques+pendants: {k_cliques} cliques -> "
          f"{n_clique_nodes + 2 * k_cliques} nodes, {m} undirected edges")

    # ---- triangles: every clique node counts C(7,2)=21, pendants 0 ----
    t0 = time.perf_counter()
    tri = triangle_count_per_node(edges, assume_canonical=True)
    distinct_counts = [r["tri_count"] for r in
                       tri.select("tri_count").distinct().collect()]
    n_tri_nodes = tri.count()
    dt = time.perf_counter() - t0
    print(f"triangles: {n_tri_nodes} nodes, distinct counts="
          f"{distinct_counts}, {dt:.1f} s")
    assert distinct_counts == [21] and n_tri_nodes == n_clique_nodes

    # ---- 7-core: pendants peel simultaneously in round 1 ----
    t0 = time.perf_counter()
    core = kcore_peel(edges, k=7, rounds=4, assume_canonical=True)
    bad = core.filter(F.col("deg") != 7).count()
    n_core = core.count()
    dt = time.perf_counter() - t0
    print(f"7-core: {n_core} survivors, {bad} wrong degrees, {dt:.1f} s")
    assert bad == 0 and n_core == n_clique_nodes

    # ---- BFS 3 hops from base node 0 (undirected -> both directions) ----
    undirected = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    t0 = time.perf_counter()
    dist = {r["node"]: r["dist"]
            for r in bfs_hops(undirected, [0], 3).collect()}
    dt = time.perf_counter() - t0
    want = {0: 0, **{i: 1 for i in range(1, 8)}, 8: 1, 9: 2}
    print(f"bfs: reached {len(dist)} nodes in 3 hops over {2*m} directed "
          f"edges, {dt:.1f} s")
    assert dist == want, f"bfs distances wrong: {sorted(dist.items())[:12]}"

    # ---- PageRank on R directed rings: perfect symmetry -> one score ----
    ring_edges = spark.range(n_rings * ring_s).select(
        F.col("id").alias("src"),
        ((F.col("id") - F.col("id") % ring_s)
         + (F.col("id") % ring_s + 1) % ring_s).alias("dst"),
    ).localCheckpoint(eager=True)
    t0 = time.perf_counter()
    pr = pagerank_fixed_point(ring_edges, iterations=5, assume_distinct=True)
    n_scores = pr.select("pr").distinct().count()
    n_nodes = pr.count()
    dt = time.perf_counter() - t0
    print(f"pagerank: {n_nodes} ring nodes, {n_scores} distinct score(s), "
          f"{dt:.1f} s")
    assert n_scores == 1 and n_nodes == n_rings * ring_s
    # ---- LPA (round 8): K disjoint cliques are perfectly symmetric, so
    # every clique must produce the IDENTICAL (node_offset -> label_offset)
    # pattern, and that pattern must equal a sequential Python LPA on one
    # 10-node clique+pendant — closed-form-by-symmetry, no oracle run ----
    from cirro_annotation_spark.operators.graph import label_propagation

    t0 = time.perf_counter()
    lpa = label_propagation(undirected, rounds=3, assume_distinct=True)
    pat = (
        lpa.select(
            (F.col("node") % 10).alias("off"),
            (F.col("label") - (F.col("node") - F.col("node") % 10)).alias(
                "lab_off"
            ),
        )
        .distinct()
        .collect()
    )
    dt = time.perf_counter() - t0
    got = {r["off"]: r["lab_off"] for r in pat}
    assert len(pat) == 10, (
        f"cliques disagree (or labels crossed cliques): {sorted(pat)}"
    )

    # sequential reference on one clique: nodes 0-7 complete, 0-8-9 chain
    adj = {i: [j for j in range(8) if j != i] for i in range(8)}
    adj[0] = adj[0] + [8]
    adj[8], adj[9] = [0, 9], [8]
    labels = {i: i for i in range(10)}
    for _ in range(3):
        labels = {
            v: min(
                sorted(
                    {labels[u] for u in adj[v]},
                    key=lambda lab: (-[labels[u] for u in adj[v]].count(lab),
                                     lab),
                )[:1]
            )
            for v in adj
        }
    assert got == labels, f"LPA pattern {got} != reference {labels}"
    print(f"lpa: {k_cliques}-clique symmetry pattern == sequential "
          f"reference over {2*m} directed edges, {dt:.1f} s")

    print("ALL GRAPH TIER CHECKS PASSED")
    return 0


if __name__ == "__main__":
    sys.exit(main())

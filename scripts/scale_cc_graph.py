"""Pressure-test connected_components on synthetic graphs with known answers.

Two shapes:
- RINGS: K disjoint rings of size S (K*S vertices, K*S edges). Every
  component is known in advance (min id of its ring), so correctness at
  scale is a zero-mismatch assertion, not an oracle run. Diameter S/2 →
  bounded propagation rounds; this is the realistic dedup-cluster shape
  (many small dense clusters).
- PATH: a single path of length L — the ADVERSARIAL diameter case for
  min-label propagation (label 0 moves one hop per round, so rounds =
  L-1). Run small; it exists to measure per-round cost honestly and to
  justify the large-star/small-star rewiring documented in
  operators/dedup.py:connected_components for long-diameter graphs.

Usage: python scripts/scale_cc_graph.py [K] [S] [L]   # default 125000 8 64
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 125_000
    s = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    path_len = int(sys.argv[3]) if len(sys.argv) > 3 else 64

    from cirro_annotation_spark.session import get_spark
    from cirro_annotation_spark.operators.dedup import connected_components

    spark = get_spark("scale-cc")

    # --- rings: K components of size S, component id = ring base ---
    ring_edges = spark.range(k * s).select(
        F.col("id").alias("id_a"),
        ((F.col("id") - F.col("id") % s) + (F.col("id") % s + 1) % s).alias("id_b"),
    )
    t0 = time.perf_counter()
    comp = connected_components(ring_edges)
    mism = comp.filter(
        F.col("component") != F.col("vertex") - F.col("vertex") % s
    ).count()
    n = comp.count()
    dt = time.perf_counter() - t0
    print(f"rings: {k*s} vertices, {k} rings of {s} -> "
          f"{n} labeled, {mism} mismatches, {dt:.1f} s")
    assert mism == 0 and n == k * s

    # --- path: worst-case diameter, rounds = L-1 ---
    path_edges = spark.range(path_len - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    t0 = time.perf_counter()
    pcomp = connected_components(path_edges, max_iter=path_len + 2)
    bad = pcomp.filter(F.col("component") != 0).count()
    dt = time.perf_counter() - t0
    print(f"path: length {path_len} -> {bad} mislabeled, {dt:.1f} s "
          f"({dt/max(path_len-1,1):.2f} s/round)")
    assert bad == 0

    # --- same path through star rewiring: O(log^2) rounds, not O(L) ---
    from cirro_annotation_spark.operators.dedup import connected_components_star

    t0 = time.perf_counter()
    scomp = connected_components_star(path_edges)
    sbad = scomp.filter(F.col("component") != 0).count()
    sdt = time.perf_counter() - t0
    print(f"path via star rewiring: {sbad} mislabeled, {sdt:.1f} s "
          f"(vs {dt:.1f} s propagation — the long-diameter switch)")
    assert sbad == 0
    return 0


if __name__ == "__main__":
    sys.exit(main())

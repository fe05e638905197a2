"""Tier-scale A/B for the three r15 graph batches the driver bench could
not confirm at sf0.1 (VERDICT r15 item 2 — "prove the graph batches at a
SF that can see them, or revert"):

  batch 7  — part-edge construction: groupBy + sorted-set posexplode/
             slice pair fan-out vs the lineitem-style SELF-JOIN.
  batch 10 — label propagation: per-node vote argmax via max_by hash
             aggregate vs the row_number window.
  batch 12 — pagerank: lazy localCheckpoint on the canonical edge frame
             (shared by the node set and the degree list) vs recomputing
             the upstream edge pipeline twice.

Each arm builds a synthetic input big enough that the operator runs tens
of seconds (defaults: 2M orders x 8-item baskets => ~56M raw pairs; 120k
cliques => ~3.7M mirrored edges; 600k rings fed through a deliberately
expensive x3-duplicated fact frame), proves the OLD and NEW shapes
produce the identical result (exceptAll both directions == 0), then
times them INTERLEAVED (old, new, old, new; min per shape) with the noop
sink. The LPA arm also re-checks partition-count independence (labels
equal under a divergent shuffle-partition layout).

Results go to stdout as a markdown table for SCALE.md.

Usage:
    python scripts/scale_graph_ab_r16.py [n_orders] [k_cliques] [n_rings]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def noop(df: DataFrame) -> float:
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def timed(fn) -> float:
    t0 = time.perf_counter()
    out = fn()
    out.write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0


def main() -> int:
    n_orders = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    k_cliques = int(sys.argv[2]) if len(sys.argv) > 2 else 120_000
    n_rings = int(sys.argv[3]) if len(sys.argv) > 3 else 600_000

    from cirro_annotation_spark.operators.graph import (
        label_propagation,
        pagerank_fixed_point,
    )
    from cirro_annotation_spark.session import get_spark

    spark = get_spark("scale-graph-ab-r16")
    sc = spark.sparkContext
    rows = []

    # ---------------- batch 7: edge construction ----------------
    # Baskets: order o holds parts hash(o*8+i) % catalog for i in 0..7
    # (duplicates within a basket are possible and WANTED — the old
    # shape deduped through distinct, the new through collect_set).
    catalog = max(1000, n_orders // 10)
    li = (
        spark.range(n_orders * 8)
        .select(
            (F.col("id") / 8).cast("long").alias("l_orderkey"),
            F.pmod(F.xxhash64("id"), F.lit(catalog)).alias("l_partkey"),
        )
        .localCheckpoint(eager=True)  # both shapes read the same input
    )

    def edges_old() -> DataFrame:
        a = li.alias("a")
        b = li.alias("b")
        return (
            a.join(
                b,
                (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
                & (F.col("a.l_partkey") < F.col("b.l_partkey")),
            )
            .select(
                F.col("a.l_partkey").alias("src"),
                F.col("b.l_partkey").alias("dst"),
            )
            .distinct()
        )

    def edges_new() -> DataFrame:
        g = (
            li.groupBy("l_orderkey")
            .agg(F.array_sort(F.collect_set("l_partkey")).alias("__ps"))
            .filter(F.size("__ps") >= 2)
        )
        anchored = g.select(F.posexplode("__ps").alias("__i", "src"), "__ps")
        return anchored.select(
            "src",
            F.explode(
                F.slice(
                    "__ps",
                    F.col("__i") + 2,
                    F.greatest(F.size("__ps") - F.col("__i") - 1, F.lit(0)),
                )
            ).alias("dst"),
        ).distinct()

    sc.setJobDescription("ab: edge-set parity")
    assert edges_new().exceptAll(edges_old()).count() == 0
    assert edges_old().exceptAll(edges_new()).count() == 0
    t_old, t_new = [], []
    for i in range(2):
        sc.setJobDescription(f"ab: edges OLD self-join round {i}")
        t_old.append(timed(edges_old))
        sc.setJobDescription(f"ab: edges NEW aggregate round {i}")
        t_new.append(timed(edges_new))
    rows.append(
        ("edge build (batch 7)", f"{n_orders:,} orders x8", min(t_old), min(t_new))
    )

    # ---------------- batch 10: LPA argmax ----------------
    # K disjoint 8-cliques with 2-node pendant chains (scale_graph_tier
    # shape), mirrored. Closed form: every clique collapses to its
    # minimum id after 3 rounds.
    c = 8
    base = spark.range(k_cliques).select((F.col("id") * 10).alias("g"))
    pairs = [(i, j) for i in range(c) for j in range(i + 1, c)]
    clique = base.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("g") + i).alias("src"),
                        (F.col("g") + j).alias("dst"),
                    )
                    for i, j in pairs
                ]
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    pend = base.select(
        F.explode(
            F.array(
                F.struct(F.col("g").alias("src"), (F.col("g") + 8).alias("dst")),
                F.struct(
                    (F.col("g") + 8).alias("src"), (F.col("g") + 9).alias("dst")
                ),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    und = clique.unionByName(pend)
    mirrored = (
        und.unionByName(
            und.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        )
        .localCheckpoint(eager=True)
    )

    def lpa_old(rounds: int = 3) -> DataFrame:
        # The r14 shape: row_number window argmax, verbatim (commit
        # 6176baa's before-side), over the same checkpointing scheme.
        e = mirrored.repartition("dst").localCheckpoint(eager=True)
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        labels = nodes.select("node", F.col("node").alias("label"))
        w = Window.partitionBy("node").orderBy(
            F.col("c").desc(), F.col("label").asc()
        )
        for _ in range(rounds):
            votes = (
                e.join(labels.withColumnRenamed("node", "dst"), "dst")
                .select(F.col("src").alias("node"), "label")
                .groupBy("node", "label")
                .agg(F.count("*").alias("c"))
                .withColumn("rn", F.row_number().over(w))
                .filter(F.col("rn") == 1)
                .select("node", F.col("label").alias("__new"))
            )
            labels = (
                labels.join(votes, "node", "left")
                .select(
                    "node",
                    F.coalesce(F.col("__new"), F.col("label")).alias("label"),
                )
                .localCheckpoint(eager=False)
            )
        return labels

    def lpa_new() -> DataFrame:
        return label_propagation(mirrored, rounds=3)

    sc.setJobDescription("ab: lpa parity")
    l_old = lpa_old().localCheckpoint(eager=True)
    l_new = lpa_new().localCheckpoint(eager=True)
    assert l_new.exceptAll(l_old).count() == 0
    assert l_old.exceptAll(l_new).count() == 0
    # Closed form at EXACTLY 3 rounds (hand-derived on the clique+chain
    # shape): every clique node and pendant-1 carries the clique minimum
    # g; pendant-2 carries g+1 (it reads pendant-1's round-2 label,
    # which was the {base=g+1, pendant2=g+8} tie -> g+1 — the base
    # itself had taken g+1 in round 1 because its own label is not in
    # its vote set). Convergence to all-g happens at round 4; the suite
    # runs 3 rounds, so 3 is what we pin.
    g_of = F.col("node") - F.pmod("node", F.lit(10))
    is_p2 = F.pmod("node", F.lit(10)) == 9
    n_bad = l_new.filter(
        F.col("label")
        != F.when(is_p2, g_of + 1).otherwise(g_of)
    ).count()
    assert n_bad == 0, f"{n_bad} nodes off the closed-form label"
    # partition-count independence of the NEW shape (divergent layout)
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        l_new7 = lpa_new().localCheckpoint(eager=True)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert l_new7.exceptAll(l_new).count() == 0
    assert l_new.exceptAll(l_new7).count() == 0

    t_old, t_new = [], []
    for i in range(2):
        sc.setJobDescription(f"ab: lpa OLD window round {i}")
        t_old.append(timed(lpa_old))
        sc.setJobDescription(f"ab: lpa NEW max_by round {i}")
        t_new.append(timed(lpa_new))
    rows.append(
        (
            "LPA 3 rounds (batch 10)",
            f"{k_cliques:,} cliques, {mirrored.count():,} edges",
            min(t_old),
            min(t_new),
        )
    )

    # ---------------- batch 12: pagerank edge checkpoint ----------------
    # Ring edges fed through a deliberately x3-duplicated fact frame, so
    # the upstream pipeline (projection + distinct) is expensive — the
    # shared-frame save is exactly "don't run that twice". Closed form:
    # every ring node has outdeg=indeg=1, so each round assigns every
    # node the identical pr.
    s = 8
    fact = (
        spark.range(n_rings * s * 3)
        .select(
            F.pmod(F.col("id"), F.lit(n_rings * s)).alias("i"),
        )
        .select(
            (F.col("i")).alias("src"),
            (
                (F.col("i") - F.pmod("i", F.lit(s)))
                + F.pmod(F.col("i") + 1, F.lit(s))
            ).alias("dst"),
        )
        .localCheckpoint(eager=True)
    )

    def pr_old(iterations: int = 5) -> DataFrame:
        # The r14 shape (commit 3616e96's before-side): no lazy
        # checkpoint on e, everything else identical to the library.
        from cirro_annotation_spark.operators.graph import (
            PR_D_DEN,
            PR_D_NUM,
            PR_SCALE,
        )

        e = fact.select("src", "dst").distinct()
        nodes = (
            e.select(F.col("src").alias("node"))
            .unionByName(e.select(F.col("dst").alias("node")))
            .distinct()
            .repartition("node")
            .localCheckpoint(eager=True)
        )
        n_nodes = nodes.count()
        teleport = (PR_SCALE - PR_D_NUM * PR_SCALE // PR_D_DEN) // n_nodes
        w_src = Window.partitionBy("src")
        e_deg = e.select(
            "src", "dst", F.count("*").over(w_src).alias("outdeg")
        ).localCheckpoint(eager=True)
        ranks = nodes.withColumn(
            "pr", F.lit(PR_SCALE // n_nodes).cast("long")
        )
        for _ in range(iterations):
            contribs = (
                e_deg.join(ranks, e_deg.src == ranks.node)
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"(pr * {PR_D_NUM}) div (outdeg * {PR_D_DEN})"
                    ).alias("c"),
                )
                .groupBy("node")
                .agg(F.sum("c").alias("inflow"))
            )
            ranks = (
                nodes.join(contribs, "node", "left")
                .select(
                    "node",
                    (F.lit(teleport) + F.coalesce(F.col("inflow"), F.lit(0)))
                    .cast("long")
                    .alias("pr"),
                )
                .localCheckpoint(eager=False)
            )
        return ranks

    def pr_new() -> DataFrame:
        return pagerank_fixed_point(fact, iterations=5)

    sc.setJobDescription("ab: pagerank parity")
    r_old = pr_old().localCheckpoint(eager=True)
    r_new = pr_new().localCheckpoint(eager=True)
    assert r_new.exceptAll(r_old).count() == 0
    assert r_old.exceptAll(r_new).count() == 0
    n_distinct_pr = r_new.select("pr").distinct().count()
    assert n_distinct_pr == 1, f"ring symmetry broken: {n_distinct_pr} pr values"

    t_old, t_new = [], []
    for i in range(2):
        sc.setJobDescription(f"ab: pagerank OLD no-ckpt round {i}")
        t_old.append(timed(pr_old))
        sc.setJobDescription(f"ab: pagerank NEW lazy-ckpt round {i}")
        t_new.append(timed(pr_new))
    rows.append(
        (
            "PageRank 5 rounds (batch 12)",
            f"{n_rings:,} rings x{s} (x3-dup fact)",
            min(t_old),
            min(t_new),
        )
    )

    print("\n| arm | input | r14 shape (s) | r15 shape (s) | speedup |")
    print("|---|---|---|---|---|")
    for name, size, o, n in rows:
        print(f"| {name} | {size} | {o:.1f} | {n:.1f} | {o / n:.2f}x |")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

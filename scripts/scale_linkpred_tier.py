"""Pressure-test graph_link_prediction at a ~1M-customer-pair tier with
CLOSED-FORM answers (the scale_graph_tier.py discipline).

Shape: K disjoint "communities": customers (10g, 10g+1) both repeat-
trade (2 lineitems per relationship) with suppliers (10g+5, 10g+6).
Closed forms per community: ONE candidate pair with n_common=2,
jaccard_ppm = 1_000_000 (identical neighborhoods), and
aa_score = 2*floor(1e12/ln 2) (both shared suppliers have degree 2).
Ties everywhere, so the top-50 is decided purely by the (cust_a,
cust_b) tie-break: communities 0..49 in id order — any candidate
explosion, lost pair, or broken tie-break shows up as a wrong row.

The cost honesty being asserted: candidate generation is keyed on the
shared supplier, so work is LINEAR in K (each supplier contributes
C(2,2)=1 pair) — the raw-graph quadratic that the K>=2 repeat filter
guards against never appears because every supplier's degree is flat.

Usage: python scripts/scale_linkpred_tier.py [K]     # default 250_000
"""
from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 250_000

    from cirro_annotation_spark.registry import QUERIES, load_all_suites
    from cirro_annotation_spark.session import get_spark

    load_all_suites()
    spark = get_spark("scale-linkpred")

    out = f"/tmp/sf_linkpred{k}"
    g = spark.range(k).select((F.col("id") * 10).alias("g"))
    # one order per (cust, supp) relationship; order ids disjoint via
    # g*4 + slot; each order carries 2 lineitems (the repeat evidence)
    rels = g.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        (F.col("g") * 4 + slot).alias("o_orderkey"),
                        (F.col("g") + c_off).alias("o_custkey"),
                        (F.col("g") + s_off).alias("suppkey"),
                    )
                    for slot, (c_off, s_off) in enumerate(
                        [(0, 5), (0, 6), (1, 5), (1, 6)]
                    )
                ]
            )
        ).alias("r")
    ).select("r.*")
    t0 = time.perf_counter()
    rels.select("o_orderkey", "o_custkey").write.mode("overwrite").parquet(
        f"{out}/orders.parquet"
    )
    rels.select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("suppkey").alias("l_suppkey"),
    ).unionByName(
        rels.select(
            F.col("o_orderkey").alias("l_orderkey"),
            F.col("suppkey").alias("l_suppkey"),
        )
    ).write.mode("overwrite").parquet(f"{out}/lineitem.parquet")
    print(f"built {out}: {k} communities, {4 * k} orders, "
          f"{8 * k} lineitems in {time.perf_counter() - t0:.1f}s")

    t0 = time.perf_counter()
    rows = sorted(
        QUERIES["graph_link_prediction"](spark, out).collect(),
        key=lambda r: r["pair_rank"],
    )
    wall = time.perf_counter() - t0
    want_aa = 2 * math.floor(1e12 / math.log(2))
    bad = [
        r
        for i, r in enumerate(rows)
        if not (
            r["n_common"] == 2
            and r["jaccard_ppm"] == 1_000_000
            and r["aa_score"] == want_aa
            and (r["cust_a"], r["cust_b"]) == (i * 10, i * 10 + 1)
        )
    ]
    print(f"graph_link_prediction @ {k} communities: {wall:.1f}s, "
          f"{len(rows)} rows, mismatches={len(bad)}")
    if bad:
        print("FIRST BAD:", bad[0])
        return 1
    print("closed-form assertions: PASS")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())

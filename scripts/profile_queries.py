"""Per-query profiling harness for the optimization rounds (guide §1).

For each query: time the PYTHON BUILD (DataFrame construction — driver-side
plan assembly, catalog reads, conf churn) separately from EXECUTION (noop
sink, min of N repeats), so optimization targets the right layer: a query
whose build time rivals its execution time is bottlenecked on plan
construction/analysis, not on the cluster.

Usage:
    python scripts/profile_queries.py                 # all queries
    python scripts/profile_queries.py q1_pricing_summary docs_dup_span_sa
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/profile_queries.py --top 40

Output: one line per query `name  build_s  exec_min_s  exec_first_s`, sorted
by exec_min descending, plus totals. Writes PROFILE.json next to the repo
root with the full detail.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="*")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "PROFILE.json"))
    args = ap.parse_args()

    import __spark_entry__ as se
    from cirro_annotation_spark.session import get_spark

    spark = get_spark("profile")
    qs = se.queries()
    todo = args.queries or list(qs)
    unknown = [n for n in todo if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # Warm JVM/codegen on the flagship (outside every timed window).
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    rows = {}
    t_all = time.perf_counter()
    for i, name in enumerate(todo, 1):
        spark.sparkContext.setJobDescription(f"profile:{name}")
        t0 = time.perf_counter()
        df = qs[name](spark, SF_DIR)
        t_build = time.perf_counter() - t0
        execs = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            # Rebuild each repeat: the bench times build+exec together, so
            # the repeat semantics must match (some queries do driver work
            # during build that re-runs per bench repeat).
            d2 = qs[name](spark, SF_DIR)
            d2.write.format("noop").mode("overwrite").save()
            execs.append(time.perf_counter() - t0)
        rows[name] = {
            "build": round(t_build, 3),
            "first": round(execs[0], 3),
            "min": round(min(execs), 3),
        }
        # same between-query hygiene as bench.py (untimed)
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith("stream_out_"):
                spark.catalog.dropTempView(tbl.name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        if i % 25 == 0:
            print(f"  {i}/{len(todo)} ({time.perf_counter()-t_all:.0f}s)",
                  file=sys.stderr)

    with open(args.out, "w") as fh:
        json.dump(rows, fh, indent=1, sort_keys=True)
    order = sorted(rows, key=lambda n: -rows[n]["min"])
    print(f"{'query':42s} {'build':>7s} {'min':>7s} {'first':>7s}")
    for n in order:
        r = rows[n]
        print(f"{n:42s} {r['build']:7.2f} {r['min']:7.2f} {r['first']:7.2f}")
    print(
        f"TOTAL build={sum(r['build'] for r in rows.values()):.1f}s "
        f"min={sum(r['min'] for r in rows.values()):.1f}s "
        f"first={sum(r['first'] for r in rows.values()):.1f}s "
        f"n={len(rows)}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

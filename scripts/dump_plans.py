"""Dump .explain('formatted') for named queries to plans/r15/<q>_<tag>.txt.

Usage:
    python scripts/dump_plans.py --tag before docs_dup_span_sa dedup_minhash_pairs
    python scripts/dump_plans.py --tag after  docs_dup_span_sa

Plans are built (analysis only, no actions — apart from any driver-side
model state a query computes during construction) at sf0.01, matching the
plan-fingerprint gate's scale.
"""
from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--tag", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--outdir", default=os.path.join(REPO, "plans", "r15"))
    args = ap.parse_args()

    import __spark_entry__ as se
    from cirro_annotation_spark.session import get_spark

    spark = get_spark("dump_plans")
    qs = se.queries()
    os.makedirs(args.outdir, exist_ok=True)
    for name in args.queries:
        df = qs[name](spark, args.sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(args.outdir, f"{name}_{args.tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(path)
    return 0


if __name__ == "__main__":
    sys.exit(main())

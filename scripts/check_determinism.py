"""Cross-config determinism sweep (round-13 verification-depth axis).

The DuckDB oracle gate proves Spark-vs-oracle agreement at ONE Spark
configuration. This harness proves Spark-vs-Spark agreement across two
deliberately different configurations of the same session jar:

  A: default 200 shuffle partitions, AQE explicitly OFF, 128 MB input
     splits. (Spark 3.2+ enables AQE by default, so "off" must be
     pinned, not assumed — ADVICE r13: without the explicit pin, A and
     B both ran adaptive and the sweep's AQE axis was vacuous.)
  B: shuffle.partitions=7 and AQE on — fewer, larger partitions means
     every hash aggregate and join builds its per-partition partials
     over DIFFERENT row groupings, and AQE may re-plan joins entirely
  C: files.maxPartitionBytes=1m and openCostInBytes=0 — many tiny
     input splits, so the MAP side (scan-local partial aggregates,
     per-partition combiners) sees a different row grouping too; A/B
     vary the reduce side, C varies the scan side.

Every session sets the ``spark.cirro.tuneLayout=false`` sentinel, which
tells the engine's tune_existing() (invoked by suites/util.t and the
streaming readers at every query's first table read) to pin only the
SEMANTICS confs (UTC, NTZ inference, Arrow) and leave the layout confs
above alone. Without the sentinel tune_existing re-converged all three
sessions onto one layout at the first read, and the whole comparison
silently tested one config three times (round-13 review finding — the
first 350/350 results were vacuous and were re-run after the fix).

Any query whose result depends on partition count — an order-dependent
float accumulation surfacing past the 1e-9 canonical rounding, a
tie-break resolved by arrival order, a limit-without-order — hashes
differently between A and B. This is the failure class the oracle gate
can mask (both engines can agree at config A yet the result be
config-dependent), and it matters at 100 TB because a production
cluster never runs the fixture partition count.

rows-only queries (no DuckDB oracle: native sketch interiors, xxhash64
banding, streaming Bloom) get their FIRST value-level check here:
their interiors are engine-private but must still be deterministic.

Usage:
    python scripts/check_determinism.py [--sf-dir /root/testdata/sf0.01] [query ...]

Exit 1 if any query's (rowcount, schema, value-hash) differs — except
the BOUNDED_ESTIMATE set (native Datasketches HIP estimates,
layout-dependent by design), where float columns must agree within
REL_TOL and everything else exactly; those print BOUND instead of SAME.
"""
from __future__ import annotations

import argparse
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Per-config layout confs. The tuneLayout sentinel MUST accompany them
# or tune_existing() re-pins the layout at the first table read.
CONFIGS = {
    "A-vanilla": {
        "spark.sql.adaptive.enabled": "false",
    },
    "B-shuffle7-aqe": {
        "spark.sql.shuffle.partitions": "7",
        "spark.sql.adaptive.enabled": "true",
    },
    "C-splits1m": {
        "spark.sql.files.maxPartitionBytes": "1m",
        "spark.sql.files.openCostInBytes": "0",
    },
}


def build_sessions(base):
    """One newSession() per CONFIGS entry, sentinel set on all.

    The base session itself is never handed out and never mutated
    (ADVICE r13: setting the sentinel on the process-global getOrCreate
    session left layout tuning disabled for whatever ran afterwards in
    the same process).
    """
    sessions = []
    for _, confs in CONFIGS.items():
        s = base.newSession()
        s.conf.set("spark.cirro.tuneLayout", "false")
        for k, v in confs.items():
            s.conf.set(k, v)
        sessions.append(s)
    return sessions


# Native-sketch estimates whose floats are partition-LAYOUT-dependent BY
# DESIGN (round-14 finding, surfaced the moment config A genuinely
# turned AQE off at sf0.1): Datasketches HLL uses the HIP estimator
# while a sketch ingests raw updates and abandons it on union, so a
# source whose rows land in ONE input split (single partial, HIP) and
# the same source split across many (union of partials, composite
# estimator) legitimately report slightly different estimates — both
# inside the published error bound. The REGISTERS are layout-invariant;
# the engine-neutral md5-register family (agg_hll_md5_*) is the
# hash-deterministic twin and stays under the exact gate. For the
# queries below, the gate re-aligns rows on the declared key columns,
# checks every non-estimate column exactly, and each declared estimate
# column within REL_TOL across configs (mirroring the <2%-of-exact
# bound tests/test_sketch_hll.py pins; observed at sf0.1: per-source
# 1482-1507 vs 1494 for exact 1500 -- multi-partial union vs
# single-partial HIP). Spark's own approx_count_distinct (HLL++, plain
# register max, no HIP) is NOT in this set -- it hash-matches exactly
# across layouts.
BOUNDED_ESTIMATE = {
    "agg_hll_mergeable": {
        "keys": ["event_type"],
        "est": ["estimate", "merged_estimate"],
    },
}
REL_TOL = 0.02


def _bounded_ok(frames, keys, est) -> bool:
    ref = frames[0].sort_values(keys).reset_index(drop=True)
    for f in frames[1:]:
        if len(f) != len(ref) or list(f.columns) != list(ref.columns):
            return False
        f = f.sort_values(keys).reset_index(drop=True)
        for col in ref.columns:
            a, b = ref[col], f[col]
            if col in est:
                av, bv = a.to_numpy("float64"), b.to_numpy("float64")
                if not (abs(av - bv) <= REL_TOL * abs(av)).all():
                    return False
            elif not a.equals(b):
                return False
    return True


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        "cc", os.path.join(here, "check_correctness.py")
    )
    cc = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(cc)

    import __spark_entry__ as se

    spark_a = cc._vanilla_spark()
    sessions = build_sessions(spark_a)

    qs = se.queries()
    names = args.names or list(qs)

    n_fail = 0
    for name in names:
        try:
            frames = [
                cc._canon(qs[name](s, args.sf_dir).toPandas())
                for s in sessions
            ]
            ref = frames[0]
            if name in BOUNDED_ESTIMATE:
                spec = BOUNDED_ESTIMATE[name]
                ok = _bounded_ok(frames, spec["keys"], spec["est"])
                status = "BOUND" if ok else "DIFF"
            else:
                ok = all(
                    len(f) == len(ref)
                    and list(f.columns) == list(ref.columns)
                    and cc._hash(f) == cc._hash(ref)
                    for f in frames[1:]
                )
                status = "SAME" if ok else "DIFF"
            if not ok:
                n_fail += 1
            print(
                f"{status:6s} {name:35s} "
                f"rows {'/'.join(str(len(f)) for f in frames)}",
                flush=True,
            )
        except Exception:
            n_fail += 1
            err = traceback.format_exc().splitlines()[-1]
            print(f"ERR    {name:35s} {err[:120]}", flush=True)

    print(f"\n{len(names) - n_fail}/{len(names)} deterministic")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

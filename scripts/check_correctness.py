"""Driver-mimicking correctness harness.

Runs each queries() entry through the PUBLIC __spark_entry__ surface and
compares against its oracle_sql() in DuckDB at the given sf, replicating
the driver's gate: row count, schema (column names sorted), and a value
hash over name-sorted columns with rows sorted by all columns.

Usage:
    python scripts/check_correctness.py [--sf-dir /root/testdata/sf0.01] [query ...]

With no query names, runs everything. Exit code 1 if anything fails.

The session is VANILLA by default (bare ``SparkSession.builder.master``,
no engine SQL confs) — exactly what the driver hands ``queries()``. The
round-4 red set was invisible to this gate precisely because it ran on
``get_spark()``'s tuned session (inferTimestampNTZ disabled there masked
the TIMESTAMP_NTZ failure mode); every query must now prove it is
self-sufficient on a session the engine did not build. ``--tuned`` opts
back into the tuned session for A/B debugging.
"""
from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _canon(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pd.api.types.is_datetime64_any_dtype(pdf[c]):
            pdf[c] = pdf[c].dt.tz_localize(None).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(pdf[c]):
            pdf[c] = pdf[c].round(9)
    if len(pdf):
        pdf = pdf.sort_values(by=list(pdf.columns), kind="mergesort").reset_index(drop=True)
    return pdf


def _hash(pdf: pd.DataFrame) -> str:
    # No float_format: an int64 983 must hash differently from a float64
    # 983.0 ("%.9g" masked exactly that drift and hid the r02 driver red).
    return hashlib.sha256(pdf.to_csv(index=False).encode()).hexdigest()[:16]


def _vanilla_spark():
    """A driver-like session: master + memory only, ZERO engine SQL confs.

    No pinned timezone, no inferTimestampNTZ/nanosAsLong, no AQE — if a
    query needs any of those it must set them itself (suites/util.t does
    via tune_existing), or it fails here the same way it fails on the
    driver's session.
    """
    from pyspark.sql import SparkSession

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("check_correctness_vanilla")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--tuned", action="store_true",
                    help="use the engine's get_spark() session instead of vanilla")
    ap.add_argument(
        "--write-artifact",
        action="store_true",
        help="write CORRECTNESS_r{N}b.json — the session-side mid-round "
        "artifact the PRIORITY rotation consumes (VERDICT r13 item 3). "
        "Refused unless the run covers the FULL registry at the driver's "
        "sf0.01 on the vanilla session: a partial or tuned run must never "
        "claim round-level greens.",
    )
    ap.add_argument("names", nargs="*")
    args = ap.parse_args()

    # Path identity, not substring (code-review r14: "sf0.01" in
    # "/tmp/old_sf0.01_copy" must not let stale data claim round greens).
    _canonical = os.path.realpath("/root/testdata/sf0.01")
    if args.write_artifact and (
        args.names or args.tuned
        or os.path.realpath(args.sf_dir) != _canonical
    ):
        print(
            "--write-artifact requires a full-registry vanilla run on "
            f"{_canonical} exactly",
            file=sys.stderr,
        )
        return 2

    artifact_path = None
    if args.write_artifact:
        import glob
        import re

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        past = [
            int(m.group(1))
            for p in glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))
            if (m := re.search(r"_r(\d+)\.json$", p))
        ]
        env_rnd = os.environ.get("SPARK_GRAFT_ROUND")
        rnd = int(env_rnd) if env_rnd else max(past, default=0) + 1
        artifact_path = os.path.join(repo, f"CORRECTNESS_r{rnd:02d}b.json")
        # Inference is max(driver rounds)+1 — correct mid-round, but a
        # second sweep the same round (or one run after the driver's
        # close file lands) would silently overwrite the artifact or
        # attribute greens to a round that hasn't happened, inflating
        # freshness in the PRIORITY rotation (ADVICE r14). Overwriting
        # requires saying which round you mean — and the refusal fires
        # HERE, before the minutes-long sweep, not after it
        # (code-review r15).
        if env_rnd is None and os.path.exists(artifact_path):
            print(
                f"refusing to overwrite existing "
                f"{os.path.basename(artifact_path)} with an inferred round "
                "number; set SPARK_GRAFT_ROUND explicitly to re-record "
                "this round's artifact",
                file=sys.stderr,
            )
            return 2

    import __spark_entry__ as se

    if args.tuned:
        from cirro_annotation_spark.session import get_spark
        spark = get_spark("check_correctness")
    else:
        spark = _vanilla_spark()
    qs = se.queries()
    oracles = se.oracle_sql()
    names = args.names or list(qs)

    con = duckdb.connect()
    # Spill guard (round-12b incident): an oracle that is naive-by-design
    # (unrolled LPA at a 10x tier) once spilled 42 GB into a repo-cwd
    # .tmp/ and filled the box. Route DuckDB temp under /tmp and cap it
    # so a runaway oracle fails fast instead of exhausting the disk.
    con.execute("SET temp_directory='/tmp/duckdb_oracle_tmp'")
    con.execute("SET max_temp_directory_size='20GiB'")
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{args.sf_dir}/{tbl}.parquet')"
        )

    results: dict[str, dict] = {}
    n_fail = 0
    for name in names:
        rec: dict = {}
        try:
            sdf = qs[name](spark, args.sf_dir)
            spdf = _canon(sdf.toPandas())
            rec["spark_rows"] = len(spdf)
            if name in oracles:
                opdf = _canon(con.execute(oracles[name]).df())
                rec["oracle_rows"] = len(opdf)
                rec["rows_match"] = len(spdf) == len(opdf)
                rec["schema_match"] = list(spdf.columns) == list(opdf.columns)
                rec["hash_match"] = rec["schema_match"] and _hash(spdf) == _hash(opdf)
                if not rec["hash_match"]:
                    rec["spark_cols"] = list(spdf.columns)
                    rec["oracle_cols"] = list(opdf.columns)
                    n_fail += 1
            else:
                rec["err"] = "no_oracle"
        except Exception:
            rec["err"] = traceback.format_exc().splitlines()[-1]
            n_fail += 1
        results[name] = rec
        status = (
            "GREEN" if rec.get("hash_match")
            else ("ROWS-ONLY" if rec.get("err") == "no_oracle" and "spark_rows" in rec
                  else "FAIL")
        )
        print(f"{status:10s} {name:35s} {json.dumps(rec)[:160]}", flush=True)

    print(f"\n{len(names) - n_fail}/{len(names)} ok")

    if artifact_path is not None:
        # Written even when queries failed: the rotation ledger consumes
        # per-query hash_match rows, so a red query keeps its old
        # last-green round (and rotates into PRIORITY sooner) while the
        # passing queries' greens still count.
        with open(artifact_path, "w") as fh:
            json.dump(results, fh, indent=1, sort_keys=True)
            fh.write("\n")
        print(f"wrote {artifact_path} ({len(results)} rows) — commit together "
              "with the regenerated PRIORITY (scripts/rotate_priority.py)")

    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

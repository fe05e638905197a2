"""Tier evidence for the round-12b tail (VERDICT r12 items 3 & 6).

The eight queries that landed in the final r12b wave have COVERAGE
and PLANS rows but no SCALE.md tier rows — this runner produces them
without re-timing the ~100 queries the per-family tier scripts cover
(that evidence already exists). It reuses the family builders
verbatim, times ONLY the tail queries, and prints the
check_correctness command that gates each batch at the tier.

Tiers:
  events 100x (10M rows)     events_runs_test, events_benford_first_digit,
                             events_anova_hour_of_day, dedup_template_mask,
                             events_ccf_lead_lag
  lineitem 100x (15M orders) orders_duplicate_payments,
                             sample_systematic_every_k
  documents 100x (500k docs) docs_source_vocab_overlap
  customer 100x (1.5M rows)  agg_iqr_outlier_fences  (custom build here:
                             customer replicated with shifted custkey —
                             the only table the query reads)

Plus the VERDICT item-6 skew proof: hotcust / hotcust01 dirs whose
orders table plants ONE customer with 10,000 orders on a sparse
amount/day lattice — band survivors are exactly 9,900 pairs, but the
custkey equi-join must evaluate the 1e4 x 1e4 within-key combination
space on a single key — the worst-case hot key the PLANS.md
fan-out-bound argument must survive. hotcust stacks the plant on the
100x tier (timing evidence); hotcust01 stacks it on sf0.1 (the
oracle-gateable variant — see the note at that target).

Usage: python scripts/scale_r13_tail.py
           [events|lineitem|docs|customer|hotcust|hotcust01 ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

TAIL = {
    "events": (
        "scale_events_tier",
        100,
        [
            "events_runs_test",
            "events_benford_first_digit",
            "events_anova_hour_of_day",
            "dedup_template_mask",
            "events_ccf_lead_lag",
        ],
    ),
    "lineitem": (
        "scale_lineitem_tier",
        100,
        ["orders_duplicate_payments", "sample_systematic_every_k"],
    ),
    "docs": (
        "scale_documents_tier",
        100,
        ["docs_source_vocab_overlap"],
    ),
}

ALL_TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def build_customer(n_copies: int) -> str:
    out_dir = f"/tmp/sf_customer{n_copies}x"
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SRC}/customer.parquet")
    copies = []
    for i in range(n_copies):
        t = src
        if i:
            t = t.set_column(
                t.schema.get_field_index("c_custkey"), "c_custkey",
                pc.add(t["c_custkey"], i * 10_000_000),
            )
        copies.append(t)
    big = pa.concat_tables(copies)
    pq.write_table(big, f"{out_dir}/customer.parquet", row_group_size=65536)
    for name in ALL_TABLES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"customer: {big.num_rows} rows ({n_copies}x) -> {out_dir}")
    return out_dir


def build_hotcust(base_dir: str, out_dir: str = "/tmp/sf_hotcust") -> str:
    """Clone the lineitem-tier orders and plant one 10k-order customer.

    The planted orders form a 100 amount-step x 100 day-cell lattice
    (steps $10k apart — wider than the $5k band; day cells 24 days
    apart — only ADJACENT cells fall inside the 30-day band), so the
    band survivors are exactly 100 x 99 = 9,900 pairs while the
    custkey group itself is the ~5e7-combination worst case the
    equi-join must grind through on one key.
    """
    os.makedirs(out_dir, exist_ok=True)
    orders = pq.read_table(f"{base_dir}/orders.parquet")
    hot_key = 999_999_937  # outside every replicated custkey range
    n_hot = 10_000
    base_key = 5_000_000_000
    okeys = pa.array([base_key + i for i in range(n_hot)], pa.int64())
    custs = pa.array([hot_key] * n_hot, pa.int64())
    # lattice: day = 1995-01-01 + (i % 100)*24 days (0..2376);
    # price = 10_000 + (i // 100) * 10_000 dollars (100 steps, $1M span)
    import datetime as dt

    d0 = dt.datetime(1995, 1, 1)
    dates = pa.array(
        [d0 + dt.timedelta(days=(i % 100) * 24) for i in range(n_hot)],
        pa.timestamp("us"),
    )
    prices = pa.array(
        [10_000.0 + (i // 100) * 10_000.0 for i in range(n_hot)],
        pa.float64(),
    )
    sch = orders.schema
    cols = []
    for f in sch:
        if f.name == "o_orderkey":
            cols.append(okeys.cast(f.type))
        elif f.name == "o_custkey":
            cols.append(custs.cast(f.type))
        elif f.name == "o_orderdate":
            cols.append(dates.cast(f.type))
        elif f.name == "o_totalprice":
            cols.append(prices.cast(f.type))
        else:
            filler = orders[f.name].combine_chunks()
            assert len(filler) > 0, f"orders.{f.name} empty — no filler row"
            cols.append(pa.concat_arrays([filler[:1]] * n_hot).cast(f.type))
    hot = pa.Table.from_arrays(cols, schema=sch)
    big = pa.concat_tables([orders, hot])
    # ADVICE r13: the planted keys start at 5e9 on the ASSUMPTION that
    # the replicated tier's shifted orderkeys stay below it — a silent
    # collision would corrupt the 9,900-pair expectation the skew proof
    # asserts. Fail loudly instead.
    import pyarrow.compute as pc

    n_unique = pc.count_distinct(big["o_orderkey"]).as_py()
    assert n_unique == big.num_rows, (
        f"o_orderkey collision after planting: {big.num_rows - n_unique} "
        f"duplicates — raise base_key above the tier's max orderkey"
    )
    pq.write_table(big, f"{out_dir}/orders.parquet", row_group_size=65536)
    for name in ALL_TABLES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{base_dir}/{name}.parquet", dst)
    print(f"hotcust: {big.num_rows} orders (planted {n_hot} @ custkey {hot_key})")
    return out_dir


def run_queries(out_dir: str, names: list[str]) -> None:
    from cirro_annotation_spark.registry import QUERIES, load_all_suites
    from cirro_annotation_spark.session import get_spark

    load_all_suites()
    spark = get_spark("scale-r13-tail")
    for name in names:
        t0 = time.perf_counter()
        QUERIES[name](spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        print(f"{name:32s} {time.perf_counter() - t0:8.3f} s", flush=True)
    print(
        f"oracle gate: python scripts/check_correctness.py "
        f"--sf-dir {out_dir} {' '.join(names)}"
    )


def _load(mod_name: str):
    import importlib.util

    here = os.path.dirname(os.path.abspath(__file__))
    spec = importlib.util.spec_from_file_location(
        mod_name, os.path.join(here, f"{mod_name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    # The 100x events tier needs the executor-sized heap the family
    # script defaults (session-window state at 10M rows).
    os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    targets = sys.argv[1:] or ["events", "lineitem", "docs", "customer", "hotcust"]
    for tgt in targets:
        if tgt in TAIL:
            mod_name, n, names = TAIL[tgt]
            out_dir = _load(mod_name).build(n)
            run_queries(out_dir, names)
        elif tgt == "customer":
            run_queries(build_customer(100), ["agg_iqr_outlier_fences"])
        elif tgt == "hotcust":
            base = "/tmp/sf_lineitem100x"
            if not os.path.exists(f"{base}/orders.parquet"):
                base = _load("scale_lineitem_tier").build(100)
            run_queries(build_hotcust(base), ["orders_duplicate_payments"])
        elif tgt == "hotcust01":
            # sf0.1 base + the planted hot customer: the band-survivor
            # output stays comparator-sized here, so THIS is the
            # variant the DuckDB oracle gates (the 100x-replica tiers
            # plant ~100 identical copies of every order, whose
            # billions of true-duplicate pairs overwhelm the
            # comparator, not the operator — see SCALE.md round 13).
            run_queries(
                build_hotcust(SRC, out_dir="/tmp/sf_hotcust01"),
                ["orders_duplicate_payments"],
            )
        else:
            raise SystemExit(f"unknown target {tgt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())

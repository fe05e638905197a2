"""Synthesize a scaled orders+lineitem tier for the relational joins.

The events/docs tier scripts scale their own tables; the bloom-semi
join (VERDICT r8 item 5) is bounded by LINEITEM volume, so this builds
an N x orders/lineitem tier (default 10x = 6M lineitem rows) by
replicating the real sf0.1 tables with disjoint orderkey ranges per
copy — the orders->lineitem foreign key is preserved exactly, so every
DuckDB oracle still applies at the tier.

Usage:
    python scripts/scale_lineitem_tier.py [N]
    python scripts/check_correctness.py --sf-dir /tmp/sf_lineitem{N}x \
        join_bloom_semi q1_pricing_summary ...
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
PASSTHROUGH = [
    "region", "nation", "customer", "supplier", "part",
    "events", "documents", "embeddings",
]

# Queries whose cost scales with lineitem/orders volume; the bloom
# prefilter's value GROWS with the fact side (16 KiB bitmap constant).
QUERIES = [
    "join_bloom_semi",
    "q1_pricing_summary",
    "q4_order_priority",
    "join_range_band",
    # round 10: basket rules (checkpointed distinct-items frame), the
    # LATERAL/RFM/Gini customer analytics, ship-lag percentiles, and
    # the SQL reshape twins
    "basket_assoc_rules",
    "sql_lateral_topk",
    "orders_rfm_segments",
    "orders_gini_concentration",
    "lineitem_shiplag_percentiles",
    "sql_unpivot_metrics",
    "sql_pivot_status",
    "supplier_scorecard",
    "orders_monthly_growth",
    # round 12b: assortativity (pair enumeration scales with lineitem
    # even though the DISTINCT edge set is copy-invariant) and the
    # Morton-layout zone-map audit (scan-local z expression)
    "graph_degree_assortativity",
    "layout_zorder_stats",
    # round 12b wave 5: ABC classification (distributed prefix sum)
    "orders_abc_analysis",
    # round 12b wave 8: shuffle-skew diagnostics (64-cell per-key frames)
    "profile_shuffle_skew",
    # round 12b wave 14: duplicate-payment audit (custkey-bounded pairs;
    # tier replication PLANTS true duplicates the audit must find)
    "orders_duplicate_payments",
    "sample_systematic_every_k",
]


def build(n_copies: int) -> str:
    out_dir = f"/tmp/sf_lineitem{n_copies}x"
    os.makedirs(out_dir, exist_ok=True)
    offset = 100_000_000
    # o_custkey is deliberately NOT shifted: customer.parquet is an
    # unscaled symlink, so shifting it would point replicated orders at
    # nonexistent customers and silently drop them from inner joins
    # (ADVICE r9). Unshifted = N x orders per customer, every FK valid.
    for name, keys in (
        ("orders", ["o_orderkey"]),
        ("lineitem", ["l_orderkey"]),
    ):
        src = pq.read_table(f"{SRC}/{name}.parquet")
        copies = []
        for i in range(n_copies):
            t = src
            if i:
                for k in keys:
                    t = t.set_column(
                        t.schema.get_field_index(k), k,
                        pc.add(t[k], i * offset),
                    )
            copies.append(t)
        big = pa.concat_tables(copies)
        # many row groups = realistic scan parallelism (docs-tier note)
        pq.write_table(
            big, f"{out_dir}/{name}.parquet", row_group_size=65536
        )
        print(f"{name}: {big.num_rows} rows ({n_copies}x)")
    for name in PASSTHROUGH:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"built {out_dir}")
    return out_dir


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out_dir = build(n)

    from cirro_annotation_spark.registry import QUERIES as REG, load_all_suites
    from cirro_annotation_spark.session import get_spark

    load_all_suites()
    spark = get_spark("scale-lineitem")
    total = 0.0
    for name in QUERIES:
        t0 = time.perf_counter()
        REG[name](spark, out_dir).write.format("noop").mode(
            "overwrite"
        ).save()
        dt = time.perf_counter() - t0
        total += dt
        print(f"{name:28s} {dt:8.3f} s", flush=True)
    print(
        f"total {total:.1f} s at {n}x (oracle-check via "
        f"scripts/check_correctness.py --sf-dir {out_dir})"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

"""TPC-H completion suite: the 10 plan shapes rounds 1-4a hadn't covered.

With these, all 22 TPC-H query shapes have an adaptation in the engine
(q1/q3/q5/q6/q7/q10/q13/q14/q17/q18/q19/q22 live in relational.py). The
driver testdata lacks ``partsupp`` and the lineitem commit/receipt/
shipmode columns, so the six queries that touch them are *adapted*: the
join/subquery/aggregation SHAPE — the thing that matters for the plan at
100 TB — is preserved exactly, with the missing column replaced by an
available one of the same role (documented per query). Reference parity:
the reference (run_annotate.py) has no joins at all; these cover the
north-star relational surface the driver tables exercise.

Scale notes are inline per query, as in relational.py: what broadcasts,
what shuffles, and why the plan survives 100x.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import MONEY, RATIO, t

# Exact-decimal revenue term shared with relational.py's TPC-H block:
# double sums differ across engines in the last ulps; decimal sums are
# exact, so threshold/extremum comparisons are knife-edge-safe.
_REV_DEC_SQL = (
    "CAST(l_extendedprice AS DECIMAL(14,2))"
    " * (1 - CAST(l_discount AS DECIMAL(3,2)))"
)


def _rev_dec() -> F.Column:
    return F.col("l_extendedprice").cast("decimal(14,2)") * (
        F.lit(1).cast("decimal(3,2)") - F.col("l_discount").cast("decimal(3,2)")
    )


# ---------------------------------------------------------------------------
# Q2 shape: correlated-min subquery over a supplier-cost relation, then a
# dim-join fan-out and top-k. No partsupp table -> the (part, supplier)
# cost relation is derived from lineitem: a supplier's unit cost for a
# part is the minimum l_extendedprice/l_quantity it ever shipped at.
# Scale: the cost relation groups lineitem by (part, supp) — ONE shuffle
# on a composite key; the per-part min is a window over the grouped
# (already small) relation, not the fact table; region/nation/supplier/
# part are broadcast dims. Division is a single IEEE double op, identical
# across engines, so min-equality is exact.
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    oracle="""
    WITH costs AS (
        SELECT l_partkey, l_suppkey,
               MIN(l_extendedprice / l_quantity) AS unit_cost
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
        GROUP BY l_partkey, l_suppkey
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, p_name, unit_cost
    FROM costs
    JOIN part     ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE p_size = 15
      AND unit_cost = (SELECT MIN(unit_cost) FROM costs c2
                       WHERE c2.l_partkey = costs.l_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 10
    """,
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE").select(
        "r_regionkey"
    )
    s = (
        t(spark, sf_dir, "supplier")
        .join(F.broadcast(n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)),
              F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("__unit"),
    )
    # One exchange, not two: hash-partitioning on l_partkey alone satisfies
    # BOTH the (partkey, suppkey) aggregate's clustered distribution and
    # the per-part window's, so the explicit repartition replaces the
    # pair-key exchange AND the window exchange Catalyst would insert.
    costs = (
        li.join(F.broadcast(s.select("s_suppkey")), F.col("l_suppkey") == F.col("s_suppkey"))
        .repartition("l_partkey")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.min("__unit").alias("unit_cost"))
    )
    w = Window.partitionBy("l_partkey")
    best = costs.withColumn("__min_cost", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("__min_cost")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_size") == 15).select(
        "p_partkey", "p_name"
    )
    return (
        best.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", "p_partkey"
        )
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Q4 shape: EXISTS semi-join from orders to lineitem, counted by priority.
# commitdate/receiptdate absent -> "late line" is l_shipdate more than 45
# days after o_orderdate (same role: a per-line lateness predicate that
# correlates both tables). Scale: quarter filter pushes into the orders
# scan; the semi-join shuffles on orderkey and emits at most one row per
# order; the final agg is on a 5-row priority domain (map-side combine
# collapses it before the exchange).
# ---------------------------------------------------------------------------
@query(
    "q4_order_priority",
    oracle="""
    SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-10-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem
                  WHERE l_orderkey = o_orderkey
                    AND l_shipdate > o_orderdate + INTERVAL 45 DAY)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-07-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        o.join(
            li,
            (o.o_orderkey == li.l_orderkey)
            & (li.l_shipdate > o.o_orderdate + F.expr("INTERVAL 45 DAYS")),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


# ---------------------------------------------------------------------------
# Q8 shape: national market share — a 7-table join feeding a per-year
# conditional-sum ratio. All columns exist; only nation names differ
# (NATION_*). Scale: part/supplier/customer-nation-region subtrees all
# broadcast; lineitem joins orders on orderkey (the one big shuffle);
# the two sums fold into one conditional aggregate pass. Decimal sums
# keep the ratio knife-edge-safe.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    oracle=f"""
    SELECT o_year,
           ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_9' THEN volume
                              ELSE CAST(0 AS DECIMAL(14,2)) END) AS DOUBLE)
                 / CAST(SUM(volume) AS DOUBLE), {RATIO}) AS mkt_share
    FROM (
        SELECT EXTRACT(year FROM o_orderdate) AS o_year,
               {_REV_DEC_SQL} AS volume,
               n2.n_name AS supp_nation
        FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
        WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
          AND l_orderkey = o_orderkey AND o_custkey = c_custkey
          AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
          AND r_name = 'AMERICA' AND s_nationkey = n2.n_nationkey
          AND o_orderdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                              AND TIMESTAMP '1996-12-31 00:00:00'
          AND p_type = 'STANDARD'
    ) all_nations
    GROUP BY o_year
    """,
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD").select(
        "p_partkey"
    )
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "AMERICA").select(
        "r_regionkey"
    )
    cust_nations = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey).select(
        F.col("n_nationkey").alias("__cn_key")
    )
    c = t(spark, sf_dir, "customer").join(
        F.broadcast(cust_nations), F.col("c_nationkey") == F.col("__cn_key")
    ).select("c_custkey")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n.select("n_nationkey", F.col("n_name").alias("supp_nation"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "supp_nation")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") <= F.lit("1996-12-31 00:00:00").cast("timestamp"))
    ).select("o_orderkey", "o_custkey", F.year("o_orderdate").alias("o_year"))
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", _rev_dec().alias("volume")
    )
    zero = F.lit(0).cast("decimal(14,2)")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(c, F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .groupBy("o_year")
        .agg(
            F.round(
                F.sum(
                    F.when(F.col("supp_nation") == "NATION_9", F.col("volume"))
                    .otherwise(zero)
                ).cast("double")
                / F.sum("volume").cast("double"),
                RATIO,
            ).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# Q9 shape: product-line profit by supplier nation x order year. No
# ps_supplycost -> cost proxy is 0.6 * p_retailprice * l_quantity (same
# role: a per-line cost term sourced from a joined dim), so the part join
# stays load-bearing. Exact-decimal profit keeps cross-engine sums
# identical before the final round. Scale: part filter prunes the
# broadcast dim; lineitem->orders is the only fact-fact shuffle; group
# domain is (25 nations x 7 years).
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    oracle=f"""
    SELECT nation, o_year,
           CAST(ROUND(SUM(amount), {MONEY}) AS DOUBLE) AS sum_profit
    FROM (
        SELECT n_name AS nation,
               EXTRACT(year FROM o_orderdate) AS o_year,
               {_REV_DEC_SQL}
                 - CAST(0.6 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(14,2))
                   * CAST(l_quantity AS DECIMAL(12,2)) AS amount
        FROM part, supplier, lineitem, orders, nation
        WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
          AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
          AND p_name LIKE '%bolt'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt")).select(
        "p_partkey", "p_retailprice"
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n = t(spark, sf_dir, "nation").select("n_nationkey", F.col("n_name").alias("nation"))
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").alias("o_year")
    )
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_orderkey", "l_quantity",
        "l_extendedprice", "l_discount",
    )
    amount = _rev_dec() - (
        F.lit(0.6).cast("decimal(2,1)")
        * F.col("p_retailprice").cast("decimal(14,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .withColumn("amount", amount)
        .groupBy("nation", "o_year")
        .agg(F.round(F.sum("amount"), MONEY).cast("double").alias("sum_profit"))
    )


# ---------------------------------------------------------------------------
# Q11 shape: grouped value with a HAVING-over-scalar-subquery threshold.
# No partsupp -> part "value" is lineitem revenue from suppliers in three
# nations (same role: a per-part value restricted to a supplier slice,
# thresholded against a global aggregate of the same slice). The original
# scales its fraction by 1/SF; a share-of-total constant is vacuous at
# one scale or the other, so the threshold here is scale-free — parts
# worth more than 2x the average — written as n*val > 2*total so the
# comparison stays in exact integer x decimal arithmetic (no division,
# no engine rounding drift). Scale: the grouped frame is small; the
# (total, n) pair is a broadcast 1-row aggregate of that same frame (no
# second scan of the fact table).
# ---------------------------------------------------------------------------
@query(
    "q11_important_stock",
    oracle=f"""
    WITH v AS (
        SELECT l_partkey,
               SUM({_REV_DEC_SQL}) AS val
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name IN ('NATION_9', 'NATION_6', 'NATION_11')
        GROUP BY l_partkey
    )
    SELECT l_partkey AS p_partkey,
           CAST(ROUND(val, {MONEY}) AS DOUBLE) AS part_value
    FROM v, (SELECT SUM(val) AS total, COUNT(*) AS n FROM v) s
    WHERE s.n * val > 2 * s.total
    """,
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    n = t(spark, sf_dir, "nation").filter(
        F.col("n_name").isin("NATION_9", "NATION_6", "NATION_11")
    ).select("n_nationkey")
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey")
    li = t(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_extendedprice", "l_discount"
    )
    v = (
        li.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"), "left_semi")
        .groupBy("l_partkey")
        .agg(F.sum(_rev_dec()).alias("val"))
    )
    stats = v.agg(
        F.sum("val").alias("__total"), F.count(F.lit(1)).alias("__n")
    )
    return (
        v.crossJoin(F.broadcast(stats))
        .filter(F.col("__n") * F.col("val") > 2 * F.col("__total"))
        .select(
            F.col("l_partkey").alias("p_partkey"),
            F.round(F.col("val"), MONEY).cast("double").alias("part_value"),
        )
    )


# ---------------------------------------------------------------------------
# Q12 shape: two-way conditional counts per category from an
# orders⋈lineitem join. No l_shipmode -> the category is l_returnflag
# (same role: a low-cardinality lineitem attribute); the year filter
# pushes into the lineitem scan. Scale: one orderkey shuffle, one
# 3-row-domain aggregate; both CASE sums fold into a single pass.
# ---------------------------------------------------------------------------
@query(
    "q12_priority_by_returnflag",
    oracle="""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_priority_by_returnflag(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_orderkey", "l_returnflag")
    o = t(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q15 shape: revenue view + scalar-subquery max, joined back to the dim.
# Scale: the revenue view is one quarter-filtered scan + supplier-key
# aggregate; the max is a broadcast 1-row aggregate OF THE VIEW (the
# view is computed once in the plan, not twice — Spark reuses the
# exchange under AQE); equality on exact decimals.
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               SUM({_REV_DEC_SQL}) AS total_rev
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name,
           CAST(ROUND(total_rev, {MONEY}) AS DOUBLE) AS total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_rev = (SELECT MAX(total_rev) FROM revenue)
    """,
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_extendedprice", "l_discount")
    rev = li.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_rev_dec()).alias("total_rev")
    )
    mx = rev.agg(F.max("total_rev").alias("__max_rev"))
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("__max_rev"))
        .join(F.broadcast(s), F.col("supplier_no") == F.col("s_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev"), MONEY).cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# Q16 shape: supplier-variety count per part group, with an anti-join
# exclusion list. No partsupp -> the part-supplier relation is DISTINCT
# (l_partkey, l_suppkey) from lineitem; the "complaints" exclusion is
# suppliers with negative acctbal (same role: a computed supplier
# denylist applied as NOT IN). Scale: the exclusion list broadcasts as
# an anti-join; count-distinct shuffles once on the 3-col group key.
# ---------------------------------------------------------------------------
@query(
    "q16_part_supplier_variety",
    oracle="""
    SELECT p_brand, p_type, p_size,
           CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#5'
      AND p_size IN (1, 4, 9, 14, 19, 23)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_part_supplier_variety(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#5") & F.col("p_size").isin(1, 4, 9, 14, 19, 23)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    bad = t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    li = t(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# Q20 shape: nested semi-join chain — suppliers having a part where their
# shipped share exceeds a per-part threshold. No ps_availqty -> "excess"
# is a (supplier, part) year-quantity exceeding 25% of the part's total
# year-quantity (same role: a correlated per-part threshold). Scale: one
# (supp, part) composite-key aggregate; the per-part total is a second
# aggregate OF THE GROUPED FRAME (tiny); part-name filter broadcasts;
# final supplier semi-join keys on suppkey only.
# ---------------------------------------------------------------------------
@query(
    "q20_excess_suppliers",
    oracle="""
    WITH pair AS (
        SELECT l_suppkey, l_partkey,
               SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l_suppkey, l_partkey
    ),
    tot AS (SELECT l_partkey, SUM(qty) AS total FROM pair GROUP BY l_partkey)
    SELECT DISTINCT s_suppkey, s_name
    FROM supplier
    WHERE s_suppkey IN (
        SELECT l_suppkey
        FROM pair JOIN tot USING (l_partkey)
        JOIN part ON l_partkey = p_partkey
        WHERE p_name LIKE '%bolt'
          AND qty > CAST(0.25 AS DECIMAL(3,2)) * total
    )
    """,
)
def q20_excess_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    ).select("l_suppkey", "l_partkey", "l_quantity")
    pair = li.groupBy("l_suppkey", "l_partkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty")
    )
    tot = pair.groupBy("l_partkey").agg(
        (F.lit(0.25).cast("decimal(3,2)") * F.sum("qty")).alias("__threshold")
    )
    p = t(spark, sf_dir, "part").filter(F.col("p_name").like("%bolt")).select(
        "p_partkey"
    )
    excess = (
        pair.join(tot, "l_partkey")
        .join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .filter(F.col("qty") > F.col("__threshold"))
        .select("l_suppkey")
    )
    s = t(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return s.join(
        excess, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi"
    ).select("s_suppkey", "s_name")


# ---------------------------------------------------------------------------
# Q21 shape: EXISTS + NOT EXISTS self-joins on the fact table — suppliers
# who were the ONLY late shipper on multi-supplier F-status orders. No
# receipt/commit dates -> "late" is l_shipdate > o_orderdate + 60 days
# (same role: a row-level lateness predicate). Scale: the base frame
# filters to one nation's suppliers (broadcast); both the EXISTS
# (semi) and NOT-EXISTS (anti) self-joins key on orderkey with a
# supplier-inequality residual — hash joins, no cartesian; the final
# count groups on supplier name.
# ---------------------------------------------------------------------------
@query(
    "q21_waiting_supplier",
    oracle="""
    WITH late AS (
        SELECT l_orderkey, l_suppkey
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderstatus = 'F'
          AND l_shipdate > o_orderdate + INTERVAL 60 DAY
    )
    SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
    FROM late l1
    JOIN supplier ON l1.l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_9'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 20
    """,
)
def q21_waiting_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F").select(
        "o_orderkey", "o_orderdate"
    )
    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey", "l_shipdate")
    late = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
        .select("l_orderkey", "l_suppkey")
    )
    n = t(spark, sf_dir, "nation").filter(F.col("n_name") == "NATION_9").select(
        "n_nationkey"
    )
    s = t(spark, sf_dir, "supplier").join(
        F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey")
    ).select("s_suppkey", "s_name")
    l1 = late.join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    )
    late_others = late.select(
        F.col("l_orderkey").alias("o3_orderkey"), F.col("l_suppkey").alias("o3_suppkey")
    )
    return (
        l1.join(
            others,
            (F.col("l_orderkey") == F.col("o2_orderkey"))
            & (F.col("l_suppkey") != F.col("o2_suppkey")),
            "left_semi",
        )
        .join(
            late_others,
            (F.col("l_orderkey") == F.col("o3_orderkey"))
            & (F.col("l_suppkey") != F.col("o3_suppkey")),
            "left_anti",
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )

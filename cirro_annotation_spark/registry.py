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
    # ROUND-11 WINDOW ROTATION — the RE-VERIFICATION era. After
    # CORRECTNESS_r10 every oracle-backed query in the repo has at least
    # one driver hash-green row, so the never-scored remainder is empty
    # and the window's job changes: fill the driver's 50 hash-checked
    # slots with the STALEST-scored queries — most recent hash-green
    # round oldest first, tie-broken by name (the r2-era scalar/
    # relational/set families were last gate-checked 8 rounds of code
    # churn ago). Never-scored names (new queries) sort first
    # (last_green = -1), so round-11 additions mechanically displace the
    # newest re-verification entries. The list below is EXACTLY the
    # output of scripts/rotate_priority.py; tests/test_registry.py
    # recomputes it from CORRECTNESS_r*.json history and asserts
    # equality — no hand-maintained membership (VERDICT r10 item 1).
    # ------------------------------------------------------------------
    # never hash-scored (round-11 additions / oracle upgrades) — sort first
    "dedup_simhash_verify",
    "docs_url_canonical_dedup",
    "rag_mmr_rerank",
    "stream_dedup_ttl_expiry",
    # last green r2 (25)
    "agg_count_distinct",
    "agg_cube",
    "agg_grouped_stats",
    "filter_row_predicate",
    "join_anti",
    "join_broadcast_lookup",
    "join_outer_agg",
    "join_semi",
    "project_rename",
    "scalar_array_funcs",
    "scalar_conditional",
    "scalar_date_format",
    "scalar_date_parts",
    "scalar_json_extract",
    "scalar_math_funcs",
    "scalar_path_funcs",
    "scalar_regex_extract",
    "scalar_str_endswith",
    "scalar_string_funcs",
    "set_distinct",
    "set_except",
    "set_intersect",
    "set_union_distinct",
    "sort_lexical",
    "sort_topk",
    # last green r3 (6)
    "scalar_try_cast",
    "sim_cosine_all",
    "text_fingerprint",
    "text_quality_score",
    "text_stopword_ratio",
    "window_ntile_rank",
    # last green r4 (6)
    "agg_rollup",
    "dedup_first_wins",
    "first_of_group",
    "melt_unpivot",
    "sim_near_dup_embeddings",
    "text_term_frequency",
    # last green r5 (first 9 by name)
    "agg_grouping_sets",
    "asof_join_last_purchase",
    "asof_join_tolerance",
    "cdc_merge_upsert",
    "docs_chunk_overlap",
    "docs_gopher_quality_rules",
    "docs_segment_dedup_ratio",
    "events_resample_ffill",
    "join_equi_topk",
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

"""Headline benchmark: representative queries from every operator family,
timed at $SPARK_GRAFT_SF_DIR (default sf0.1) on local[$SPARK_GRAFT_CPUS].

Output contract (round-7 fix, tightened r14 — the driver keeps only the
last ~2000 chars of stdout, and round 6's single JSON line outgrew that
window once the per-query dict passed 106 entries, leaving BENCH_r06
unparseable; in r13 the detail line printed first still left a clipped
mid-dict fragment in the tail):
  1. the FULL detail line (metric/value/unit/queries/sf) is written ONLY
     to BENCH_DETAIL.json next to this script (stdout gets a one-line
     pointer), so the per-query numbers persist without polluting the
     driver's tail;
  2. stdout ENDS with one SHORT summary line
     {"metric": "headline_suite_total", "value": N, "unit": "sec",
      "sf": ..., "n_queries": ..., "queries_file": "BENCH_DETAIL.json"}
     that always fits the driver's tail capture regardless of suite size.

Execution is forced with a noop-format write — the full physical plan runs
(scan → shuffle → agg) without driver-side collection, so the number is
the engine's throughput, not pandas conversion time.

Each query runs $SPARK_GRAFT_BENCH_REPEATS times (default 3) and reports
the MIN — single-shot timing made round-over-round comparison impossible
to adjudicate against run-to-run noise (round-3 judge finding). Min is
the right statistic for a throughput bar: it is the least contaminated
by concurrent-session contention and GC pauses.

JVM generations (VERDICT r13 item 4, tested and REJECTED as default):
the r13 hypothesis was that same-HEAD spread (39 s / 11%) came from
350 queries sharing one JVM (ContextCleaner backlog, block-manager
pressure). SPARK_GRAFT_BENCH_GENERATIONS=N re-execs the suite in N
fresh JVMs over contiguous HEADLINE shards (SPARK_GRAFT_BENCH_SHARD
marks a child; startup and per-child q1 warmup outside every timed
window) — and the r14 six-run same-HEAD A/B (SCALE.md round 14) found
no benefit in any sample: gen4 totals 417.9/397.0/431.2 s vs gen1
372.3/378.6/453.7 s, where the last gen1 sample (20% above its own
config's earlier pair, 40 minutes later) shows hour-scale HOST
variance dominates any configuration effect. Default is therefore 1
(single JVM — simpler, directly comparable with r1-r13 history); the
generation machinery stays as an opt-in isolation diagnostic. Plan
regressions are policed by PLAN_FINGERPRINTS.json, not by this
wall-clock number; per-query adjudication uses solo re-measures.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One headline per operator family (SURVEY.md §2): relational agg, multiway
# join, reshape, window, as-of, exact + near dedup, similarity, text,
# streaming-batch twin.
HEADLINE = [
    "q1_pricing_summary",
    "join_multiway",
    "melt_unpivot",
    "window_running_sum",
    "asof_join_last_purchase",
    "dedup_exact",
    "dedup_near_minhash",
    "sim_topk_cosine",
    "text_token_stats",
    "stream_tumbling_batch",
    "pipeline_training_data",
    "join_equi_topk",
    "agg_grouping_sets",
    "sim_near_dup_embeddings",
    "stream_join_batch",
    "multimodal_frame_sample",
    "q3_shipping_priority",
    "q6_revenue_forecast",
    "corpus_health_report",
    # round 4: skew-salted join, 6-table TPC-H q5, IVF vs brute-force
    # (sim_topk_ivf probes 3 of 8 cells — its delta vs sim_topk_cosine
    # is the ANN speedup evidence)
    "join_salted_skew",
    "q5_local_supplier_volume",
    "sim_topk_ivf",
    # round 4 additions: transitive-closure dedup clustering, the
    # scan-local quality gate, a two-sided broadcast-dim TPC-H shape,
    # the changelog merge, and single-shuffle cohort retention
    "dedup_cluster_components",
    "docs_gopher_quality_rules",
    "q7_nation_volume",
    "cdc_merge_upsert",
    "window_retention_cohorts",
    # round 4b: the two TPC-H completion shapes promoted into the scored
    # window (7-table ratio, semi+anti self-joins) and the new pipeline
    # ops (packing window, segment-dedup fingerprint shuffle)
    "q8_market_share",
    "q21_waiting_supplier",
    "pipeline_pack_sequences",
    "docs_segment_dedup_ratio",
    # round 5: the ts-heavy family fixed this round (time-range window,
    # gap sessionization, grid resample+ffill, ordered funnel, bounded
    # as-of) plus one end-to-end STREAMING drain — readStream → watermark
    # → windowed agg → memory sink, the engine's streaming throughput
    # number rather than just the batch twin's
    "window_time_range_sum",
    "sessionize_gap",
    "events_resample_ffill",
    "window_funnel_stages",
    "asof_join_tolerance",
    "stream_tumbling_stream",
    # round 5 additions: RAG prep + retrieval and the dedup terminal
    # stage (survivor rewrite)
    "docs_chunk_overlap",
    "rag_retrieve_context",
    "dedup_survivor_corpus",
    "events_rollup_multigrain",
    "events_value_histogram",
    "events_interarrival_stats",
    "text_langid_confusion",
    "docs_pii_scan",
    "embeddings_norm_stats",
    # round 6 (append-only, r5 verdict item 4 — bench every family): the
    # correlated-subquery and group-max TPC-H shapes, the scalar HOF/map
    # family, hash-deterministic sampling/split, and the streaming CDC
    # merge (readStream → foreachBatch latest-wins rewrite)
    "q2_min_cost_supplier",
    "q15_top_supplier",
    "scalar_map_funcs",
    "scalar_hof_exists_forall",
    "sample_stratified_hash",
    "split_train_eval",
    "stream_cdc_apply",
    # round 6 additions: SemDeDup (pinned-quantizer cell-local cosine
    # dedup) and the ExactSubstr-style duplicate-8-gram span coverage
    "sim_semantic_dedup",
    "docs_dup_span_coverage",
    "docs_dup_span_removal",
    "docs_unigram_perplexity",
    "events_psi_drift",
    "profile_lineitem",
    "stream_histogram_stream",
    "dedup_incremental_batch",
    "sim_topk_pq",
    "sim_topk_ivfpq",
    # round 6b additions: linear interpolation + exact-integer KS drift
    # (time-series family), bloom-routed incremental dedup (its delta vs
    # dedup_incremental_batch is the prefilter evidence), per-source
    # cap + pinned-weight classifier (corpus curation), and 5-round
    # fixed-point PageRank (the iterative-join family's bench number)
    "events_interpolate_linear",
    "events_ks_drift",
    "dedup_bloom_prefilter",
    "docs_per_source_cap",
    "docs_quality_classifier",
    "graph_pagerank_trade",
    "events_heavy_hitters",
    "events_rolling_active_users",
    "events_attribution_last_touch",
    "docs_table_diff",
    "pipeline_curation_report",
    "events_quantile_histogram",
    "sim_topk_lsh_multiprobe",
    "sim_topk_matryoshka",
    "events_mad_outliers",
    "events_cusum_daily",
    # round 6c additions: degree-ordered triangle counting (the wedge
    # self-join's cost is the O(m^1.5) orientation-bound evidence) and
    # the exact prefix-filtered similarity join (candidate pruning vs
    # its deliberately brute-force oracle)
    "graph_triangle_parts",
    "dedup_jaccard_prefix_join",
    "asof_join_nearest_purchase",
    "docs_expectations_report",
    "sample_fixed_k_hash",
    "text_bm25_topk",
    "events_scd2_history",
    "events_type_transitions",
    "sample_weighted_k",
    "docs_chi_square_langs",
    "events_ohlc_daily",
    "basket_rules_lift",
    "graph_kcore_parts",
    "graph_bfs_hops",
    "embeddings_covariance",
    "events_session_paths",
    "orders_open_per_day",
    "sample_flatten_length_dist",
    "docs_top_mass_per_source",
    "events_daily_correlation",
    "events_daily_trend",
    "dedup_fuzzy_blocked",
    "events_ab_conversion_ztest",
    "events_cohort_ltv",
    "embeddings_centroid_drift",
    "multimodal_phash_buckets",
    "stream_distinct_users_hourly",
    # round 7 additions: the entity-resolution capstone (composite
    # blocking → levenshtein scoring → transitive closure → golden
    # record, corpus-wide) and the zero-shuffle VAD segmentation fold
    "pipeline_entity_resolution",
    "multimodal_vad_segments",
    "embeddings_kmeans_train",
    "text_bpe_train_merges",
    "docs_dsir_weights",
    "dedup_sorted_neighborhood",
    "text_bpe_encode_fertility",
    "rag_hybrid_rrf",
    "sim_hard_negatives",
    "embeddings_pq_train",
    "sim_ann_recall_report",
    "embeddings_prototype_prune",
    "sim_ivf_cell_stats",
    "pipeline_length_buckets",
    "pipeline_entity_resolution_incremental",
    "events_cms_user_counts",
    "pipeline_corpus_funnel",
    # round 8 (append-only, r7 verdict item 7 — representatives for every
    # family still outside the bench): heavy TPC-H shapes (q9 profit,
    # q18 group-filter join, q4/q12/q20 semi-join family), relational
    # interiors (cube, exact percentiles, range-band join, EXISTS),
    # manifest/scalar/multimodal/window/streaming coverage, the LSH and
    # int8/kNN similarity paths, minhash verify + levenshtein kernels,
    # tfidf/decontaminate text shapes, FFD packing, and the terminal
    # materialize capstone (funnel + write path + reconcile)
    "q9_product_profit",
    "q18_large_volume_customer",
    "q4_order_priority",
    "q12_priority_by_returnflag",
    "q20_excess_suppliers",
    "agg_cube",
    "agg_percentiles_exact",
    "join_range_band",
    "sql_exists_subquery",
    "set_except",
    "dedup_cluster_auto",
    "dedup_minhash_verify",
    "dedup_fuzzy_levenshtein",
    "graph_pagerank_personalized",
    "manifest_melt_standard",
    "manifest_harvest_columns",
    "scan_jsonl_typed",
    "multimodal_binary_stats",
    "multimodal_resize",
    "scalar_from_json_struct",
    "scalar_regex_extract",
    "sim_cosine_int8",
    "sim_knn_join_batch",
    "sim_near_dup_lsh",
    "stream_stateful_counts",
    "stream_sliding_stream",
    "stream_dedup_watermark",
    "stream_session_stream",
    "text_tfidf_top",
    "text_decontaminate_ngram",
    "pipeline_pack_ffd",
    "pipeline_corpus_materialize",
    "window_zscore_anomaly",
    "window_moving_avg",
    "window_rank_topk_per_group",
    # round 8b: the r8 query wave itself (funnel incremental + UniMax +
    # CCNet terciles + LPA + dim-clip QA + dataset card + novelty +
    # top-k twins + lexical fold + daily quantiles)
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
    # round 8c: the bucketized interval-overlap join (scored form of the
    # operators/joins.py kernel) and the two-stage residual-quantizer
    # trainer (stage-2 kmeans over exact integer residuals)
    "join_interval_overlap",
    "embeddings_rq_train",
    "sim_topk_rq",
    "docs_classifier_train_perceptron",
    "stream_psi_daily_batch",
    "stream_psi_daily_stream",
    "events_spc_rules",
    "join_bloom_semi",
    # round 9 (append-only, r8 verdict item 4 — bench the remaining 81):
    # with these the bench is the COMPLETE registry, every registered
    # query timed. Families: the agg interiors, the TPC-H remainder
    # (q10-q22), manifest compile/harvest shapes, the scalar-function
    # suite, set ops, windows, sampling/splits, sketch interiors
    # (minhash/simhash/HLL), streaming batch/stream twins, and the
    # quality family over the shared feature frame.
    "agg_approx_distinct",
    "agg_count_distinct",
    "agg_grouped_stats",
    "agg_hll_mergeable",
    "agg_quarter_over_quarter",
    "agg_rollup",
    "agg_stats_moments",
    "agg_string_concat_ordered",
    "dataset_chooser_newest_first",
    "dedup_cluster_assign",
    "dedup_cluster_components_star",
    "dedup_exact_counts",
    "dedup_first_wins",
    "dedup_minhash_pairs",
    "dedup_ngram_containment_sample",
    "dedup_ngram_jaccard_sample",
    "dedup_simhash_pairs",
    "docs_repetition_ratio",
    "docs_token_entropy",
    "filter_row_predicate",
    "first_of_group",
    "join_anti",
    "join_broadcast_lookup",
    "join_outer_agg",
    "join_semi",
    "manifest_file_to_columns",
    "manifest_project_dictionary",
    "manifest_roundtrip_tokens",
    "manifest_variable_family",
    "multimodal_extract_features",
    "pipeline_embedding_centroids",
    "pivot_widen",
    "project_rename",
    "q10_returned_items",
    "q11_important_stock",
    "q13_customer_distribution",
    "q14_promo_effect",
    "q16_part_supplier_variety",
    "q17_small_quantity_revenue",
    "q19_disjunctive_revenue",
    "q22_dormant_high_balance",
    "quantile_bucket_global",
    "rag_mmr_rerank",
    "sample_mixture_weighted",
    "scalar_array_funcs",
    "scalar_conditional",
    "scalar_date_format",
    "scalar_date_parts",
    "scalar_explode_outer",
    "scalar_json_extract",
    "scalar_math_funcs",
    "scalar_path_funcs",
    "scalar_str_endswith",
    "scalar_string_funcs",
    "scalar_try_cast",
    "set_distinct",
    "set_intersect",
    "set_union_distinct",
    "sim_centroid_per_label",
    "sim_cosine_all",
    "sim_topk_lsh",
    "sort_lexical",
    "sort_topk",
    "split_kfold_assign",
    "stream_dedup_bloom",
    "stream_histogram_batch",
    "stream_join_left_batch",
    "stream_join_stream",
    "stream_session_window",
    "stream_sliding_batch",
    "stream_static_enrich",
    "text_fingerprint",
    "text_langid",
    "text_quality_score",
    "text_redact_terms",
    "text_stopword_ratio",
    "text_term_frequency",
    "text_zipf_histogram",
    "window_cume_dist_pct_rank",
    "window_lag_delta",
    "window_ntile_rank",
    # round 9 additions
    "docs_doremi_weights",
    "docs_dup_span_sa",
    "stream_cdc_replay_exactly_once",
    "events_ewma_daily",
    # round 10 additions
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
    # round 11 additions
    "dedup_simhash_verify",
    "stream_dedup_ttl_expiry",
    "docs_url_canonical_dedup",
    # round 12 additions
    "dedup_minhash_sig_verify",
    "sample_es_reservoir",
    "docs_domain_quality_gate",
    "docs_boilerplate_lines",
    "embeddings_power_iteration",
    "agg_hll_md5_registers",
    "stream_hll_registers_stream",
    "agg_hll_md5_estimate",
    "events_hll_daily_dau",
    "events_hll_rolling_wau",
    "events_hll_segment_overlap",
    # round 12b: time-series diagnostics, layout/skyline, eval stats,
    # privacy audits, the KMV/bitmap distinct structures
    "events_user_streaks",
    "events_acf_ljung_box",
    "events_changepoint_binseg",
    "graph_degree_assortativity",
    "layout_zorder_stats",
    "sort_skyline_pareto",
    "agg_weighted_median",
    "agg_mode_per_group",
    "text_rouge_pairs",
    "docs_k_anonymity",
    "text_langid_kappa",
    "text_langid_reliability",
    "events_max_drawdown",
    "events_attribution_linear",
    "sim_silhouette_ivf",
    "text_zipf_slope",
    "orders_abc_analysis",
    "agg_kmv_distinct",
    "agg_bitmap_distinct",
    "stream_bitmap_distinct_stream",
    "docs_dp_noisy_counts",
    "graph_lp_modularity",
    "profile_shuffle_skew",
    "pipeline_feature_store",
    "events_ccf_lead_lag",
    "dedup_template_mask",
    "events_anova_hour_of_day",
    "events_benford_first_digit",
    "orders_duplicate_payments",
    "sample_systematic_every_k",
    "agg_iqr_outlier_fences",
    "events_runs_test",
    "docs_source_vocab_overlap",
]


def run_shard(names: list[str]) -> dict[str, float]:
    """Time one contiguous shard of HEADLINE on a fresh session."""
    from cirro_annotation_spark.session import get_spark
    import __spark_entry__ as se

    spark = get_spark("bench")
    qs = se.queries()

    # Warm the JVM/codegen once on the flagship so per-query times measure
    # the plan, not first-call JIT.
    qs["q1_pricing_summary"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3")))
    times: dict[str, float] = {}
    for name in names:
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        times[name] = round(best, 3)
        # Between-query hygiene (NOT inside the timed window): the
        # streaming drains register memory-sink temp views and the
        # iterative queries localCheckpoint — with a large driver heap
        # the JVM may not GC for the whole suite, so ContextCleaner
        # never releases those blocks and the tail of a 60+-query run
        # measures block-manager pressure instead of the plan (observed:
        # 45 s suite degrading to 98 s, same queries fast in isolation).
        for tbl in spark.catalog.listTables():
            if tbl.name.startswith("stream_out_"):
                spark.catalog.dropTempView(tbl.name)
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
    return times


def main() -> int:
    # Fail on a malformed round pin BEFORE the ~6-minute suite runs —
    # int() at history-stamp time would crash after the fact and the
    # contract's final summary line would never print (code-review r15;
    # same fail-fast principle as _max_partition_bytes_override).
    _env_rnd = os.environ.get("SPARK_GRAFT_ROUND")
    if _env_rnd is not None and not _env_rnd.isdigit():
        raise SystemExit(
            f"SPARK_GRAFT_ROUND must be a bare integer (e.g. 16), got {_env_rnd!r}"
        )
    shard_env = os.environ.get("SPARK_GRAFT_BENCH_SHARD")
    n_gen = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_GENERATIONS", "1")))

    if shard_env is not None:
        # Child mode: time my contiguous shard, dump, exit.
        shard = int(shard_env)
        per = (len(HEADLINE) + n_gen - 1) // n_gen
        names = HEADLINE[shard * per : (shard + 1) * per]
        times = run_shard(names)
        with open(os.environ["SPARK_GRAFT_BENCH_SHARD_OUT"], "w") as fh:
            json.dump(times, fh)
        return 0

    times = {}
    if n_gen == 1:
        times = run_shard(HEADLINE)
    else:
        # Parent mode: one fresh JVM per shard (see module docstring).
        import subprocess
        import tempfile

        for i in range(n_gen):
            with tempfile.NamedTemporaryFile(
                mode="r", suffix=f"_bench_shard{i}.json", delete=False
            ) as fh:
                out_path = fh.name
            env = dict(
                os.environ,
                SPARK_GRAFT_BENCH_SHARD=str(i),
                SPARK_GRAFT_BENCH_SHARD_OUT=out_path,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)], env=env
            )
            if proc.returncode != 0:
                print(f"shard {i} failed rc={proc.returncode}", file=sys.stderr)
                os.unlink(out_path)  # don't leak the shard temp file
                return proc.returncode
            with open(out_path) as fh:
                shard_times = json.load(fh)
            os.unlink(out_path)
            dup = [n for n in shard_times if n in times]
            if dup:
                raise SystemExit(
                    f"shard {i} re-reported {len(dup)} queries already "
                    f"timed by an earlier shard (broken slicing): {dup[:5]}"
                )
            times.update(shard_times)
        # Loud, not silent: a shard that lost queries (broken slicing,
        # truncated child output) must not shrink the suite and fake a
        # speedup against BENCH_r{N} history (code-review r14). A real
        # raise, not assert — `python -O` strips asserts (ADVICE r14).
        missing = [n for n in HEADLINE if n not in times]
        if missing:
            raise SystemExit(
                f"shards lost {len(missing)} queries: {missing[:5]}"
            )
        times = {n: times[n] for n in HEADLINE}

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf
    total = round(sum(times.values()), 3)
    detail = {
        "metric": "headline_suite_total",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
    }
    # Full per-query detail goes ONLY to BENCH_DETAIL.json (VERDICT r13
    # "what's wrong" #4: printing the 14 KB detail line to stdout left a
    # clipped mid-dict JSON fragment in the driver's ~2000-char tail
    # capture; the file is the canonical detail, the tail stays clean).
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    detail_line = json.dumps(detail)
    print(f"per-query detail ({len(times)} queries) -> {detail_path}")
    with open(detail_path, "w") as fh:
        fh.write(detail_line + "\n")
    # Per-round history (VERDICT r10 item 4): BENCH_DETAIL.json alone is
    # overwritten every run, which made per-query r9->r10 regression
    # comparison impossible after the fact. Stamp a copy per driver
    # round — the round number is 1 + the highest BENCH_r{N}.json on
    # disk (the driver writes those at round close, so during round N
    # the newest is N-1).
    repo = os.path.dirname(os.path.abspath(__file__))
    import glob
    import re as _re

    past = [
        int(m.group(1))
        for p in glob.glob(os.path.join(repo, "BENCH_r*.json"))
        if (m := _re.search(r"BENCH_r(\d+)\.json$", p))
    ]
    # ADVICE r11: an explicit round beats inference — a bench rerun
    # after the driver writes the round-close BENCH_r{N}.json would
    # otherwise stamp (and pollute) round N+1's history slot. Two
    # guards: SPARK_GRAFT_ROUND pins the slot explicitly, and without
    # it only driver-config runs (sf0.1, the per-round gate) stamp
    # history — local sf0.01 iteration never claims a slot, and the
    # driver's round-close run (last sf0.1 run of the round) wins by
    # overwrite.
    env_rnd = os.environ.get("SPARK_GRAFT_ROUND")
    rnd = int(env_rnd) if env_rnd else max(past, default=0) + 1
    hist = os.path.join(repo, f"BENCH_DETAIL_r{rnd:02d}.json")
    if env_rnd or sf_val == 0.1:
        with open(hist, "w") as fh:
            fh.write(detail_line + "\n")
    # Short final line — must stay well under the driver's ~2000-char
    # stdout tail no matter how many queries the suite grows to.
    print(
        json.dumps(
            {
                "metric": "headline_suite_total",
                "value": total,
                "unit": "sec",
                "sf": sf_val,
                "n_queries": len(times),
                "queries_file": "BENCH_DETAIL.json",
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())

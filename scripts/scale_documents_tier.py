"""Synthesize a scaled documents tier and pressure-test the text/dedup family.

Mirrors scale_events_tier.py for the corpus side: replicate the REAL
sf0.1 documents N× (default 100× = 500k docs) with disjoint doc_id
ranges. Every text becomes an N-copy exact-duplicate cluster — the
ADVERSARIAL case for MinHash banding (each LSH bucket gains
N*(N-1)/2 intra-cluster candidate pairs, ~5k pairs/cluster at 100×),
and the realistic case for exact dedup (web corpora are mostly
copies). doc_id-slice queries (the CC/jaccard kernels) only see copy
0, so they are excluded here; the corpus-wide queries all scale.

Usage:
    python scripts/scale_documents_tier.py [N]       # build /tmp/sf_docs{N}x, time queries
    python scripts/check_correctness.py --sf-dir /tmp/sf_docs{N}x \
        dedup_exact text_token_stats ...             # full oracle gate at N×
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
    "orders", "lineitem", "events",
]

# Corpus-wide document queries (no doc_id-slice kernels — those only
# touch copy 0 and measure nothing at N×).
DOC_QUERIES = [
    "dedup_exact",
    "dedup_exact_counts",
    "text_token_stats",
    "text_quality_score",
    "text_langid",
    "text_fingerprint",
    "docs_gopher_quality_rules",
    "docs_repetition_ratio",
    "text_redact_terms",
    "sample_stratified_hash",
    "pipeline_training_data",
    # round 5: chunking fan-out and retrieval hydration are corpus-wide
    # (the top-k probe side broadcasts; the documents side scans fully)
    "docs_chunk_overlap",
    "rag_retrieve_context",
    # round 6 (verdict item 7): the r5 additions without a tier run yet —
    # langid share-window confusion cells and the regex PII sweep are
    # both corpus-wide scans
    "text_langid_confusion",
    "docs_pii_scan",
    # round 6b: per-source cap (source-keyed rank window), pinned-weight
    # logistic classifier (pure codegen scan), and the bloom-routed
    # incremental dedup (the prefilter's value GROWS with corpus size:
    # the bitmap stays 16 KiB while the corpus side here is 80% of the
    # tier)
    "docs_per_source_cap",
    "docs_quality_classifier",
    "dedup_bloom_prefilter",
    "pipeline_curation_report",
    # round 6c: one-scan expectations gate, fixed-k hash sample
    # (TakeOrderedAndProject must stay k-row-bounded at any corpus
    # size), and BM25 (posting-list prune: only query-term rows leave
    # the scan stage). dedup_jaccard_prefix_join is a doc_id-slice
    # kernel — excluded like the other slice kernels.
    "docs_expectations_report",
    "sample_fixed_k_hash",
    "text_bm25_topk",
    "sample_weighted_k",
    "docs_chi_square_langs",
    "sample_flatten_length_dist",
    "docs_top_mass_per_source",
    # round 7 (verdict item 8): the perceptual-hash bucketing twin is
    # corpus-wide — one scan, hash-only shuffle (the window partitions
    # by the 48-bit phash; N-clone corpora collapse each cluster into
    # one high-count bucket, the realistic near-dup-media shape)
    "multimodal_phash_buckets",
    # round 7: VAD segmentation (zero-shuffle fold, segments explode),
    # DSIR weights (256-bucket model broadcast into a doc rollup), BPE
    # training (corpus shuffle once, then vocab-only rounds — the vocab
    # table is IDENTICAL at every clone tier, so rounds cost O(1) in N)
    "multimodal_vad_segments",
    "docs_dsir_weights",
    "text_bpe_train_merges",
    # round 7b: encode join (vocab clone-invariant), octile padding
    # report (two-pass percentile + map-side bucket)
    "text_bpe_encode_fertility",
    "pipeline_length_buckets",
    # round 8: the funnel family (report, incremental decomposition,
    # terminal materialize with write-path reconcile), the datasheet
    # rollup, CCNet terciles, UniMax waterfill (strata frame stays
    # bounded at any tier), batch novelty (gram anti-join), and the
    # scan-local lexical-diversity fold
    "pipeline_corpus_funnel",
    "pipeline_funnel_incremental",
    "pipeline_corpus_materialize",
    "pipeline_dataset_card",
    "docs_ccnet_buckets",
    "sample_unimax_budget",
    "docs_ngram_novelty",
    "text_lexical_diversity",
    "docs_classifier_train_perceptron",
    # round 9: DoReMi mixture weights (one map-side-combined agg over
    # the corpus; the MW loop is driver arithmetic on ~|domains| rows)
    "docs_doremi_weights",
    # round 10: the LM/keyphrase family — every statistic is a keyed
    # count or a vocabulary-sized broadcast; N-clone corpora keep the
    # vocab (and thus model frames) IDENTICAL, so only the scan and the
    # count shuffles grow with N
    "text_collocations_pmi",
    "text_rake_keyphrases",
    "text_kn_bigram_lm",
    "text_langid_train_nb",
    "docs_kn_perplexity",
    "sample_temperature_mixture",
    "pipeline_curriculum_order",
    # round 10 closing: block-level content-hash dedup (hash + length
    # travel; payload bytes never shuffle)
    "multimodal_payload_dedup",
    "docs_readability_flesch",
    # round 12: URL prefilter (salted bounded host cap), C4 boilerplate
    # rewrite (fingerprint freq + broadcast bad set), FineWeb per-source
    # percentile gate (value-grain cells), A-ES weighted reservoir
    # (TakeOrdered), FFD packing (per-shard Arrow state)
    "docs_url_canonical_dedup",
    "docs_boilerplate_lines",
    "docs_domain_quality_gate",
    "sample_es_reservoir",
    "pipeline_pack_ffd",
    # round 12: md5-lattice MinHash banding (now fully oracle-backed;
    # N-clone corpora are the adversarial intra-cluster-pair case)
    "dedup_minhash_pairs",
    "dedup_near_minhash",
]

# doc_id-slice-free but pair-quadratic on N-clone corpora (every
# window duplicated): the SA path is gated to <=10x like the other
# dup-span interiors (see the note above DOC_QUERIES usage).
DOC_QUERIES += [
    # round 12b: k-anonymity audit (QI-tuple grouped count, corpus-wide)
    # — text_rouge_pairs is a doc_id-slice kernel (pinned 26 pairs in
    # copy 0), so it is correctness-checked at the tier but not timed
    # as a corpus-wide scan here.
    "docs_k_anonymity",
    # round 12b wave 3: agreement + reliability stats (vote-fold scan,
    # then <= n_langs^2 / 10-cell aggregates)
    "text_langid_kappa",
    "text_langid_reliability",
    # round 12b wave 4: Zipf OLS (100-row fit after the tf aggregate)
    "text_zipf_slope",
    # round 12b wave 6: seeded DP release (grouped count + per-group
    # constant arithmetic)
    "docs_dp_noisy_counts",
    # round 12b wave 11: template mining (fingerprint-grain shuffle)
    "dedup_template_mask",
    "docs_source_vocab_overlap",
]

EMB_EXTRA = [
    # round 12b wave 4: exact-lattice silhouette over pinned centroids
    "sim_silhouette_ivf",
]

SA_QUERIES = ["docs_dup_span_sa"]

# Embedding-QA queries need the EMBEDDINGS table scaled, not documents —
# build() replicates it with disjoint vec_id ranges alongside.
EMB_QUERIES = [
    "embeddings_norm_stats",
    # round 7: k-means training — per round the shuffle is k x dim
    # partials regardless of corpus size; clone tiers multiply member
    # counts, never the model state
    "embeddings_kmeans_train",
    # round 7b: PQ codebook training (one aggregate per round trains
    # all m subspaces), prototype pruning (cluster-keyed window), IVF
    # occupancy (k-cardinality agg)
    "embeddings_pq_train",
    "embeddings_prototype_prune",
    "sim_ivf_cell_stats",
    # round 8: per-dimension clip QA (explode + two 64-group aggs),
    # two-stage residual-quantizer training + its integer ADC search
    "embeddings_dim_clip_report",
    "embeddings_rq_train",
    "sim_topk_rq",
    # round 10: 1-bit quantizer — the Hamming scan reads the 16-byte
    # code table however many vectors; the rerank join fetches 50 rows
    "sim_topk_binary",
    # round 10 final wave: greedy k-center — k codegen'd min-distance
    # passes + TakeOrderedAndProject(1) each; clone tiers multiply the
    # scan, never the k x dim model state
    "embeddings_kcenter_coreset",
    # round 12: spectral trainer — scan-local upper-triangle Gram, one
    # (d1,d2) exchange; iteration runs on model frames
    "embeddings_power_iteration",
]



def build(n_copies: int) -> str:
    out_dir = f"/tmp/sf_docs{n_copies}x"
    os.makedirs(out_dir, exist_ok=True)
    src = pq.read_table(f"{SRC}/documents.parquet")
    offset = 10_000_000
    copies = []
    for i in range(n_copies):
        t = src
        if i:
            t = t.set_column(
                t.schema.get_field_index("doc_id"), "doc_id",
                pc.add(t["doc_id"], i * offset),
            )
        copies.append(t)
    big = pa.concat_tables(copies)
    # row_group_size matters: the sf fixtures ship ONE row group per
    # file, so Spark scan parallelism there is 1 task regardless of
    # maxPartitionBytes (parquet splits at row-group boundaries).
    # Production corpora are many files/row groups; the tier should
    # measure THAT shape, not the single-file artifact.
    pq.write_table(big, f"{out_dir}/documents.parquet", row_group_size=4096)
    # embeddings scale the same way (disjoint vec_id per copy) so the
    # embedding-QA queries measure an actual N× vector set.
    emb = pq.read_table(f"{SRC}/embeddings.parquet")
    emb_copies = []
    for i in range(n_copies):
        t = emb
        if i:
            t = t.set_column(
                t.schema.get_field_index("vec_id"), "vec_id",
                pc.add(t["vec_id"], i * offset),
            )
        emb_copies.append(t)
    emb_big = pa.concat_tables(emb_copies)
    pq.write_table(emb_big, f"{out_dir}/embeddings.parquet", row_group_size=4096)
    for name in TABLES:
        dst = f"{out_dir}/{name}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{SRC}/{name}.parquet", dst)
    print(
        f"built {out_dir}: {big.num_rows} documents, "
        f"{emb_big.num_rows} embeddings ({n_copies}x)"
    )
    return out_dir


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    out_dir = build(n)

    from cirro_annotation_spark.session import get_spark
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    spark = get_spark("scale-docs")
    times = {}
    # Raw banding over the N-clone corpus is the documented adversarial
    # quadratic (verify pairs ~ clones²·clusters; OOMs a single JVM at
    # 100× — see the idempotence block below). It only runs at tiers
    # the harness can hold; the composed exact→minhash path afterwards
    # is the 100× shape.
    queries = DOC_QUERIES + EMB_QUERIES + EMB_EXTRA + (
        # N-clone corpora are the adversarial case for the quadratic
        # interiors: minhash verify pairs scale as clones² (every clone
        # lands in the same LSH bucket) and docs_dup_span_coverage's
        # dup-only x8 explode degenerates to 8×(all shingles) when
        # EVERY shingle is duplicated — both gated to ≤10×; the
        # composed exact-first paths below are the 100× shape.
        # sim_semantic_dedup runs at EVERY tier: since round 8 it is the
        # occupancy-CAPPED pair stage (id-rank chunking, cap=1024 —
        # 9.2 s at 100× where the exact Arrow stage took 49.3 s and the
        # HOF twin 344.8 s already at 10×; the adversarial one-hot-cell
        # proof lives in scripts/scale_semdedup_skew.py).
        ["sim_semantic_dedup"]
        + (
            ["dedup_near_minhash", "docs_dup_span_coverage"] + SA_QUERIES
            if n <= 10
            else []
        )
        # ER capstone: on an N-clone corpus every clone IS a true fuzzy
        # duplicate, so match pairs legitimately grow as clones^2 per
        # block (growth in TRUE pairs, not a blocking failure — the
        # skewed-length blocking risk is scale_fuzzy_skew.py's job).
        # Gate like the other quadratic-true-pair interiors.
        + (["pipeline_entity_resolution"] if n <= 10 else [])
    )
    for name in queries:
        t0 = time.perf_counter()
        QUERIES[name](spark, out_dir).write.format("noop").mode("overwrite").save()
        times[name] = round(time.perf_counter() - t0, 3)
        print(f"{name:32s} {times[name]:8.3f} s")

    from pyspark.sql import functions as F
    from cirro_annotation_spark.operators import dedup as D
    from cirro_annotation_spark.suites.util import t as read_t

    # The production composition: EXACT dedup first (32-byte fingerprint
    # shuffle collapses the N-clone clusters for pennies), THEN MinHash
    # on the unique survivors. Candidate-pair interiors scale as
    # clones^2, so banding raw clone-heavy data is the adversarial worst
    # case — this is the shape that avoids it, so it runs FIRST and at
    # every tier.
    t0 = time.perf_counter()
    uniq = D.dedup_exact(
        read_t(spark, out_dir, "documents"), "text", "doc_id"
    ).localCheckpoint(eager=True)
    t_exact = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_composed = D.dedup_near_minhash(uniq, "text", "doc_id", threshold=0.7).count()
    t_minhash = time.perf_counter() - t0
    print(
        f"composed exact->minhash at {n}x: {n_composed} survivors "
        f"(exact {t_exact:.1f} s + minhash-on-unique {t_minhash:.1f} s)"
    )

    # SemDeDup composed the same way: exact dedup first, then cell-local
    # cosine on the unique survivors. With the quantizer pinned at k=8
    # the cell population grows linearly with UNIQUE corpus size, so at
    # a real 100 TB deployment k is chosen as ~n/target_cell_size (the
    # paper trains 50k clusters for 5B docs); here the survivor set is
    # 1× -sized, so pinned k=8 is in-regime.
    t0 = time.perf_counter()
    emb_uniq = read_t(spark, out_dir, "embeddings").filter(
        F.col("vec_id") < 10_000_000
    )
    from cirro_annotation_spark.operators import similarity as S
    from cirro_annotation_spark.suites._ivf_centroids import CENTROIDS

    n_removed = S.semantic_dedup_removed(
        emb_uniq, "embedding", "vec_id", CENTROIDS, threshold=0.43
    ).count()
    print(
        f"composed exact->semdedup at {n}x: {n_removed} removed "
        f"({time.perf_counter() - t0:.1f} s on the unique slice)"
    )

    # Idempotence of the RAW banding path under duplication: near-dedup
    # of the N× corpus must keep exactly the 1× survivor set (keeper =
    # min-id copy, which lives in copy 0). Verify-stage pair volume is
    # clones²·clusters (~25M text-bearing pairs at 100×), which exceeds
    # a single-JVM heap — measured: OOM at 100×, clean at ≤10× (2.4×
    # wall at 10×, SCALE.md). On a cluster the pairs spill per-executor;
    # here we gate the check to tiers the harness can hold, and the
    # composed path above IS the 100× answer.
    if n <= 10:
        t0 = time.perf_counter()
        survivors = D.dedup_near_minhash(
            read_t(spark, out_dir, "documents"), "text", "doc_id", threshold=0.7
        ).select("doc_id")
        n_total = survivors.count()
        n_copy0 = survivors.filter(F.col("doc_id") < 10_000_000).count()
        dt = time.perf_counter() - t0
        print(
            f"near-dedup survivors at {n}x: {n_total} total, {n_copy0} in copy 0 "
            f"({dt:.1f} s; 1x survivor count is 4756)"
        )
    else:
        print(
            f"raw-banding idempotence check skipped at {n}x "
            f"(clones^2 verify pairs exceed single-JVM heap; run with N<=10 — "
            f"the composed exact->minhash result above is the {n}x path)"
        )
    print(f"total {sum(times.values()):.3f} s at {n}x "
          f"(oracle-check via scripts/check_correctness.py --sf-dir {out_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())

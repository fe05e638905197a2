"""NULL/empty-input behavior of the text/dedup operators — the fixture
carries no NULLs, so these pin the edge contract explicitly: NULL text
propagates to NULL stats (never a crash, never a fake zero), empty text
scores as empty, and dedup treats all NULL-text docs as one cluster."""
from __future__ import annotations

from pyspark.sql import functions as F

from cirro_annotation_spark.operators import dedup as D
from cirro_annotation_spark.operators import text as X


def _df(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, None), (3, ""), (4, None)],
        "doc_id long, text string",
    )


def test_null_text_yields_null_stats_not_crash(spark):
    out = {
        r["doc_id"]: r
        for r in _df(spark)
        .select(
            "doc_id",
            X.token_count("text").alias("n_tok"),
            X.quality_score("text").alias("q"),
            X.langid_stopword_votes("text").alias("lang"),
            X.fingerprint_sha("text").alias("fp"),
        )
        .collect()
    }
    assert out[1]["n_tok"] == 2 and out[1]["lang"] == "und"
    assert out[2]["n_tok"] is None and out[2]["q"] is None and out[2]["fp"] is None
    assert out[2]["lang"] == "und"
    assert out[3]["n_tok"] == 0 and out[3]["fp"] is not None  # empty != NULL


def test_dedup_exact_clusters_null_texts_together(spark):
    """sha2(NULL) is NULL, and the NULL fingerprint partition keeps its
    lowest id — all no-content docs collapse to one representative
    (callers who want to KEEP null-text docs should filter them out
    before dedup; this pins the default)."""
    kept = sorted(r["doc_id"] for r in D.dedup_exact(_df(spark), "text", "doc_id").collect())
    assert kept == [1, 2, 3]  # doc 4 (second NULL) deduped into doc 2


def test_shingles_of_null_or_empty_are_empty(spark):
    rows = _df(spark).select("doc_id", D.shingles("text", 3).alias("s")).collect()
    by_id = {r["doc_id"]: r["s"] for r in rows}
    assert by_id[1] == ["hello world"]
    assert by_id[2] == [] and by_id[3] == []


def test_repetition_and_quality_exprs_on_degenerate_text(spark):
    """The round-4 quality/repetition expressions on empty / NULL /
    single-token text: no crash, no fake values. The top-token argmax
    fold must yield NULL-ish output (its init struct) on an empty token
    list, not an exception; single-token docs have dup_ratio 0 and
    top_token_frac 1."""
    df = spark.createDataFrame(
        [(1, "word"), (2, ""), (3, None), (4, "a a a b")],
        "doc_id long, text string",
    )
    lt = F.transform(X.tokens("text"), lambda x: F.lower(x))
    n = F.size(lt)
    nd = F.size(F.array_distinct(lt))
    cand = F.transform(
        F.array_distinct(lt),
        lambda d: F.struct(
            F.size(F.filter(lt, lambda x: x == d)).alias("cnt"), d.alias("tok")
        ),
    )
    best = F.aggregate(
        cand,
        F.struct(F.lit(-1).alias("cnt"), F.lit("").alias("tok")),
        lambda acc, c: F.when(
            (c["cnt"] > acc["cnt"])
            | ((c["cnt"] == acc["cnt"]) & (c["tok"] < acc["tok"])),
            c,
        ).otherwise(acc),
    )
    out = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id",
            n.alias("n"),
            (1.0 - nd / F.nullif(n, F.lit(0))).alias("dup"),
            best["cnt"].alias("top_cnt"),
            best["tok"].alias("top_tok"),
            (best["cnt"] / F.nullif(n, F.lit(0))).alias("top_frac"),
        ).collect()
    }
    assert out[1]["n"] == 1 and out[1]["dup"] == 0.0 and out[1]["top_frac"] == 1.0
    assert out[2]["n"] == 0 and out[2]["dup"] is None and out[2]["top_frac"] is None
    assert out[2]["top_cnt"] == -1  # fold init survives an empty list
    assert out[3]["n"] is None and out[3]["dup"] is None and out[3]["top_frac"] is None
    assert out[4]["top_tok"] == "a" and out[4]["top_cnt"] == 3
    assert abs(out[4]["dup"] - 0.5) < 1e-12


def test_stratified_hash_rates_deterministic(spark):
    """The md5-bucket sample keeps EXACTLY the same rows on re-run and
    under repartitioning — the reproducibility df.sample() lacks."""
    df = spark.createDataFrame(
        [(i, "en" if i % 3 else "de") for i in range(300)],
        "doc_id long, lang string",
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4), 16, 10)
        .cast("long") % 100
    )
    rate = F.when(F.col("lang") == "en", 20).otherwise(50)
    pick = lambda d: sorted(
        r["doc_id"]
        for r in d.select("doc_id", "lang")
        .filter(bucket < rate)
        .collect()
    )
    first = pick(df)
    again = pick(df.repartition(13))
    assert first == again and len(first) > 0


def test_r12_queries_survive_null_and_empty_text(spark):
    """Round-12 corpus queries against a hostile fixture: NULL text,
    empty text, whitespace-only text, and a lone normal doc. No crash;
    degenerate docs either drop out (no lines/shingles) or score
    sanely; the one normal doc always survives."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [
        (1, None, "srcA", 0),
        (2, "", "srcA", 0),
        (3, "   ", "srcA", 3),
        (4, "alpha beta gamma delta " * 10, "srcA", 230),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string, source string, n_chars int"
        ).toPandas().to_parquet(os.path.join(tmp, "documents.parquet"))

        # boilerplate: only doc 4 has tokens -> only doc 4 in output
        bl = {r["doc_id"] for r in
              QUERIES["docs_boilerplate_lines"](spark, tmp).collect()}
        assert bl == {4}

        # quality gate scores docs with LENGTH(text) > 0 (3 and 4)
        gate = {r["doc_id"]: r["kept"] for r in
                QUERIES["docs_domain_quality_gate"](spark, tmp).collect()}
        assert set(gate) == {3, 4} and gate[4]

        # ES reservoir keeps n_chars > 0 rows only (3 and 4)
        es = {r["doc_id"] for r in
              QUERIES["sample_es_reservoir"](spark, tmp).collect()}
        assert es == {3, 4}

        # minhash signature verify: NULL/empty docs yield the sentinel
        # minima (4294967296) for every seed — present, not crashed
        sig = QUERIES["dedup_minhash_sig_verify"](spark, tmp).collect()
        assert len(sig) == 4 * 32
        sentinel = {r["doc_id"] for r in sig if r["minval"] == 4294967296}
        assert sentinel == {1, 2, 3}

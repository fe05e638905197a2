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

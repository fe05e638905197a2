"""Text-analysis operator tests (langid, quality, token counts,
fingerprints) — all JVM-side column expressions."""
from __future__ import annotations

from pyspark.sql import functions as F

from cirro_annotation_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint_sha,
    langid_stopword_votes,
    quality_score,
    rolling_hash,
    token_count,
)


def _one(spark, text, col):
    return spark.createDataFrame([(text,)], "text string").select(
        col.alias("v")
    ).first()["v"]


def test_langid_english_vs_spanish(spark):
    en = "the cat sat on a mat and the dog barked to the moon"
    es = "el perro y la casa de la playa que el sol"
    de = "der hund und die katze das haus und zu der stadt"
    assert _one(spark, en, langid_stopword_votes(F.col("text"))) == "en"
    assert _one(spark, es, langid_stopword_votes(F.col("text"))) == "es"
    assert _one(spark, de, langid_stopword_votes(F.col("text"))) == "de"
    assert _one(spark, "xyzzy plugh 12345", langid_stopword_votes(F.col("text"))) == "und"


def test_token_counts(spark):
    assert _one(spark, "  a  b   c ", token_count(F.col("text"))) == 3
    assert _one(spark, "", token_count(F.col("text"))) == 0
    # BPE-ish splits punctuation and digit runs apart from words
    assert _one(spark, "hello, world42!", bpe_ish_token_count(F.col("text"))) >= 4


def test_quality_score_bounds_and_ordering(spark):
    good = "The sturdy bridge spans the river valley connecting two historic towns built long ago."
    bad = "@@@@ ???? !!!! 00000 1111 ;;;;"
    q_good = _one(spark, good, quality_score(F.col("text")))
    q_bad = _one(spark, bad, quality_score(F.col("text")))
    assert 0.0 <= q_bad < q_good <= 1.0


def test_fingerprint_normalizes_whitespace_and_case(spark):
    a = _one(spark, "Hello   World", fingerprint_sha(F.col("text")))
    b = _one(spark, "  hello world ", fingerprint_sha(F.col("text")))
    c = _one(spark, "hello worlds", fingerprint_sha(F.col("text")))
    assert a == b != c


def test_rolling_hash_deterministic_and_discriminating(spark):
    a = _one(spark, "abcdef", rolling_hash(F.col("text")))
    b = _one(spark, "abcdef", rolling_hash(F.col("text")))
    c = _one(spark, "abcdeg", rolling_hash(F.col("text")))
    assert a == b != c

"""Text-analysis queries over documents (north-star: token counting,
quality scoring, language ID, fingerprinting — SURVEY.md §2.12).

The oracle side re-expresses each heuristic in DuckDB SQL so the exact
arithmetic is verified, not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cirro_annotation_spark.operators import text as X
from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import RATIO, t


@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           LENGTH(text) AS n_chars_calc,
           LEN(list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '')) AS n_tokens,
           ROUND(LENGTH(REPLACE(TRIM(text), ' ', '')) * 1.0 /
                 NULLIF(LEN(list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '')), 0),
                 {RATIO}) AS mean_word_len
    FROM documents
    """,
)
def text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    toks = X.tokens("text")
    total_chars = F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(toks).alias("n_tokens"),
        F.round(total_chars / F.nullif(F.size(toks), F.lit(0)), RATIO).alias(
            "mean_word_len"
        ),
    )


@query(
    "text_term_frequency",
    oracle="""
    SELECT token, COUNT(*) AS tf
    FROM (SELECT UNNEST(list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '')) AS token
          FROM documents)
    GROUP BY token
    ORDER BY tf DESC, token ASC
    LIMIT 20
    """,
)
def text_term_frequency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Corpus-wide term frequency: explode + count. Map-side partial
    # aggregation makes the shuffle carry only (token, partial_count).
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(X.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), F.col("token").asc())
        .limit(20)
    )


@query(
    "text_stopword_ratio",
    oracle=f"""
    SELECT doc_id,
           ROUND(LEN(list_filter(string_split_regex(TRIM(text), '\\s+'),
                                 x -> list_contains(['the','a','of','and','to'], LOWER(x)))) * 1.0 /
                 NULLIF(LEN(list_filter(string_split_regex(TRIM(text), '\\s+'), x -> x <> '')), 0),
                 {RATIO}) AS stopword_ratio
    FROM documents
    """,
)
def text_stopword_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(X.stopword_ratio("text", X.STOPWORDS["en"]), RATIO).alias(
            "stopword_ratio"
        ),
    )


@query("text_quality_score")  # composite heuristic — rows-only check
def text_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.round(X.quality_score("text"), RATIO).alias("quality"),
        X.token_count("text").alias("n_tokens"),
        X.bpe_ish_token_count("text").alias("n_bpe_tokens"),
    )


@query("text_langid")  # heuristic voting — rows-only check
def text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        "lang",
        X.langid_stopword_votes("text").alias("lang_pred"),
    )


@query(
    "text_fingerprint",
    oracle="""
    SELECT doc_id,
           SHA256(REGEXP_REPLACE(LOWER(TRIM(text)), '\\s+', ' ', 'g')) AS fp
    FROM documents
    """,
)
def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", X.fingerprint_sha("text").alias("fp"))

"""Scalar function library (SURVEY.md §2.9) — re-exports of the engine's
column-level helpers so users import one namespace.

All of these build JVM-side Column expressions (whole-stage codegen);
none are Python UDFs.
"""

from cirro_annotation_spark.operators.similarity import cosine, dot, l2_norm
from cirro_annotation_spark.operators.text import (
    bpe_ish_token_count,
    digit_ratio,
    fingerprint_sha,
    langid_stopword_votes,
    mean_word_len,
    punct_ratio,
    quality_score,
    rolling_hash,
    stopword_ratio,
    token_count,
    tokens,
)
from cirro_annotation_spark.sources.dsv import normalize_columns

__all__ = [
    "bpe_ish_token_count",
    "cosine",
    "digit_ratio",
    "dot",
    "fingerprint_sha",
    "l2_norm",
    "langid_stopword_votes",
    "mean_word_len",
    "normalize_columns",
    "punct_ratio",
    "quality_score",
    "rolling_hash",
    "stopword_ratio",
    "token_count",
    "tokens",
]

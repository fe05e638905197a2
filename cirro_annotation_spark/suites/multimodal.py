"""Multimodal-column queries (north-star, SURVEY.md §2.12).

Binary payload stats are oracle-checked (byte arithmetic matches any
engine); the mapInPandas feature-extraction path is rows-only (the fake
codec is engine-side Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cirro_annotation_spark.operators import multimodal as M
from cirro_annotation_spark.registry import query
from cirro_annotation_spark.suites.util import t


@query(
    "multimodal_binary_stats",
    oracle="""
    SELECT doc_id AS media_id,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           SHA256(text) AS payload_sha
    FROM documents
    """,
)
def multimodal_binary_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.length(payload).cast("long").alias("n_bytes"),
        F.sha2(payload, 256).alias("payload_sha"),
    )


@query(
    "multimodal_extract_features",
    # The fake codec is deterministic byte arithmetic, so even the
    # mapInPandas path gets a real oracle (documents text is ASCII, so
    # char codes == UTF-8 bytes): checksum = sum(first 64 bytes) % 997.
    oracle="""
    SELECT doc_id AS media_id,
           'text/fake' AS kind,
           OCTET_LENGTH(ENCODE(text)) AS n_bytes,
           OCTET_LENGTH(ENCODE(text)) AS decoded_len,
           CAST(list_sum(list_transform(range(1, LEAST(LENGTH(text), 64) + 1),
                                        i -> ascii(SUBSTRING(text, CAST(i AS INT), 1)))) % 997
                AS BIGINT) AS checksum
    FROM documents
    """,
)
def multimodal_extract_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "text", "doc_id")
    return M.extract_features(media)


@query(
    "multimodal_frame_sample",
    # One media row fans out to 4 frames; frame boundaries and checksums
    # are pure byte arithmetic (ASCII text ⇒ char codes == UTF-8 bytes —
    # a non-ASCII fixture would need OCTET-based oracle arithmetic), so
    # the mapInPandas fan-out path gets a full hash check. COALESCE
    # guards the empty-frame case (payload shorter than n_frames →
    # list_sum over an empty range is NULL in DuckDB, 0 in Python).
    oracle="""
    WITH m AS (SELECT doc_id AS media_id, text, LENGTH(text) AS L,
                      LENGTH(text) // 4 AS q
               FROM documents),
    f AS (SELECT media_id, text, L, q, UNNEST([0, 1, 2, 3]) AS frame_idx
          FROM m)
    SELECT media_id,
           CAST(frame_idx AS INT) AS frame_idx,
           CAST(CASE WHEN frame_idx < 3 THEN q ELSE L - 3 * q END AS BIGINT)
             AS frame_len,
           CAST(COALESCE(list_sum(list_transform(
                  range(frame_idx * q + 1,
                        frame_idx * q + 1
                        + LEAST(16, CASE WHEN frame_idx < 3 THEN q
                                         ELSE L - 3 * q END)),
                  i -> ascii(SUBSTRING(text, CAST(i AS INT), 1)))), 0) % 997
                AS BIGINT) AS frame_checksum
    FROM f
    """,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "text", "doc_id")
    return M.frame_sample(media, n_frames=4)


@query(
    "multimodal_resize",
    # Binary→binary transform: fake resize keeps every 2nd byte (ASCII
    # text ⇒ every 2nd char). Output payload verified by sha256 — both
    # engines hash the same derived bytes. The CASE guard keeps the
    # oracle total over empty text (list_reduce errors on an empty list
    # in DuckDB — round-3 advice), matching Spark's '' output.
    oracle="""
    WITH r AS (
      SELECT doc_id AS media_id,
             CASE WHEN LENGTH(text) = 0 THEN ''
                  ELSE list_reduce(list_transform(range(1, LENGTH(text) + 1, 2),
                                                  i -> SUBSTRING(text, CAST(i AS INT), 1)),
                                   (a, b) -> a || b)
             END AS resized_text
      FROM documents)
    SELECT media_id,
           'text/fake' AS kind,
           CAST(OCTET_LENGTH(ENCODE(resized_text)) AS BIGINT) AS n_bytes,
           SHA256(resized_text) AS resized_sha
    FROM r
    """,
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    media = M.attach_binary_payload(d, "text", "doc_id")
    resized = M.resize_payloads(media, factor=2)
    return resized.select(
        "media_id",
        "kind",
        "n_bytes",
        F.sha2("payload", 256).alias("resized_sha"),
    )

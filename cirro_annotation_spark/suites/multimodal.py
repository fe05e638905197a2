"""Multimodal-column queries (north-star, SURVEY.md §2.12).

Binary payload stats are oracle-checked (byte arithmetic matches any
engine); the mapInPandas feature-extraction path is rows-only (the fake
codec is engine-side Python).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
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


@query(
    "multimodal_phash_buckets",
    # Perceptual-hash near-dup bucketing — the multimodal→dedup bridge.
    # The aHash shape (mean-threshold bit per block, public technique)
    # over the payload's first 48 bytes (every fixture doc has >= 48):
    # bit_i = byte_i > floor(mean), hash = Σ bit_i·2^i — EXACT integer
    # arithmetic, so like the other fake-codec paths it gets a full
    # oracle (ASCII text ⇒ char codes == UTF-8 bytes). n_same_hash is
    # each payload's bucket size: the real-codec deployment swaps the
    # byte reader for a pixel decoder and keeps this exact plan —
    # hash shuffle only, payloads never move.
    oracle="""
    WITH b AS (
      SELECT doc_id AS media_id,
             list_transform(range(1, 49),
                            i -> ord(substring(text, CAST(i AS INT), 1))) AS bytes
      FROM documents
    ),
    h AS (
      SELECT media_id,
             CAST(list_sum(list_transform(range(1, 49),
                  i -> CASE WHEN bytes[CAST(i AS INT)] >
                            list_sum(bytes) // 48
                       THEN POWER(2, i - 1) ELSE 0 END)) AS BIGINT) AS phash
      FROM b
    )
    SELECT media_id, phash,
           CAST(COUNT(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same_hash
    FROM h
    """,
)
def multimodal_phash_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    # Bind the byte array and its mean to lambda variables (the
    # single-element-array + transform idiom) so each is computed ONCE
    # per row. The round-6 form inlined the byte-array transform into
    # every zip_with element and re-aggregated the mean per bit:
    # ~2400 substring calls/row. Lambda-bound names are safe from
    # CollapseProject duplication — projection aliases are not (the
    # optimizer inlines multiply-referenced aliases back into every
    # use site).
    phash = F.expr(
        "transform(array(transform(sequence(1, 48),"
        "   i -> ascii(substring(text, i, 1)))),"
        " bs -> transform(array(aggregate(bs, 0, (a, y) -> a + y) div 48),"
        "   m -> aggregate(zip_with(bs, sequence(0, 47),"
        "     (b, i) -> if(b > m, shiftleft(1L, i), 0L)),"
        "     0L, (a, x) -> a + x))[0])[0]"
    )
    h = d.select(F.col("doc_id").alias("media_id"), phash.alias("phash"))
    w = Window.partitionBy("phash")
    return h.select(
        "media_id",
        "phash",
        F.count(F.lit(1)).over(w).cast("long").alias("n_same_hash"),
    )

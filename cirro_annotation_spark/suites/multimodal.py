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
    # over the payload's first 48 bytes (0-padded past EOF on both
    # engines — sf0.1 has a 44-char doc):
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
                            i -> CASE WHEN i <= LENGTH(text)
                                 THEN ord(substring(text, CAST(i AS INT), 1))
                                 ELSE 0 END) AS bytes
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
    # Out-of-range guard on BOTH engines: Spark ascii('') is 0 but
    # DuckDB ord('') is -1, so a doc shorter than 48 chars (sf0.1 has a
    # 44-char one) would shift the mean differently per engine — pin
    # the padding byte to 0 explicitly in each dialect.
    phash = F.expr(
        "transform(array(transform(sequence(1, 48),"
        "   i -> if(i <= length(text), ascii(substring(text, i, 1)), 0))),"
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


@query(
    "multimodal_vad_segments",
    # Voice-activity-style SEGMENTATION over the fake audio signal —
    # the multimodal → time-segmentation bridge (silence removal, scene
    # cut detection, speech turn splitting all reduce to this shape).
    # Signal: 64 frames at stride 4 over the payload's first 256 bytes
    # (0-padded past EOF on both engines — the phash discipline);
    # active = energy > 100; output = maximal runs of active frames
    # (seg_start, seg_end, n_frames). Exact integer arithmetic ⇒ full
    # oracle; a real deployment swaps the byte reader for a PCM energy
    # decode and keeps the plan.
    #
    # Scale shape: the run-detection is a single fold over the frame
    # array INSIDE the scan stage (accumulator carries open-run state,
    # finish flushes it) — ZERO shuffles; only the (id, start, end)
    # segment rows leave via explode. The classic SQL form — explode
    # all frames, then a gaps-and-islands window per media — shuffles
    # 64× the corpus and pays a per-media sort; the oracle uses exactly
    # that form, so the hash match also proves the fold ≡ the window
    # formulation.
    oracle="""
    WITH f AS (
      SELECT doc_id AS media_id, CAST(k AS INT) AS pos,
             CASE WHEN k*4+1 <= LENGTH(text)
                  THEN ord(substring(text, CAST(k*4+1 AS INT), 1))
                  ELSE 0 END AS energy
      FROM documents, range(0, 64) r(k)
    ),
    a AS (SELECT media_id, pos FROM f WHERE energy > 100),
    g AS (SELECT media_id, pos,
                 pos - ROW_NUMBER() OVER (PARTITION BY media_id ORDER BY pos)
                   AS grp
          FROM a)
    SELECT media_id, CAST(MIN(pos) AS INT) AS seg_start,
           CAST(MAX(pos) AS INT) AS seg_end,
           CAST(COUNT(*) AS BIGINT) AS n_frames
    FROM g GROUP BY media_id, grp
    """,
)
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    segs = F.expr(
        "aggregate(sequence(0, 63),"
        " named_struct('segs', array_repeat(named_struct('s', 0, 'e', 0), 0),"
        "              'cur', -1, 'prev', -1),"
        " (acc, k) -> if("
        "   if(k * 4 + 1 <= length(text),"
        "      ascii(substring(text, k * 4 + 1, 1)), 0) > 100,"
        "   named_struct('segs', acc.segs,"
        "                'cur', if(acc.cur = -1, k, acc.cur), 'prev', k),"
        "   if(acc.cur = -1, acc,"
        "      named_struct('segs', array_append(acc.segs,"
        "                     named_struct('s', acc.cur, 'e', acc.prev)),"
        "                   'cur', -1, 'prev', -1))),"
        " acc -> if(acc.cur = -1, acc.segs,"
        "           array_append(acc.segs,"
        "                        named_struct('s', acc.cur, 'e', acc.prev))))"
    )
    return (
        d.select(F.col("doc_id").alias("media_id"), F.explode(segs).alias("g"))
        .select(
            "media_id",
            F.col("g.s").alias("seg_start"),
            F.col("g.e").alias("seg_end"),
            (F.col("g.e") - F.col("g.s") + 1).cast("long").alias("n_frames"),
        )
    )


@query(
    "multimodal_payload_dedup",
    # Block-level exact dedup over binary payloads (round 10) — the
    # multimodal sibling of dedup_exact, at the STORAGE grain: fixed
    # 128-byte leading blocks collapse by content hash (the fixed-size
    # chunking half of dedup storage systems; content-defined chunking
    # generalizes the boundary choice, the hash-group machinery is
    # identical). Reports each duplicate block group with its survivor
    # (lowest id), copy count, and the bytes a block store reclaims.
    # Scale shape: one hash-keyed partial agg — payload bytes never
    # shuffle (hash + length travel; the 32-byte/n-byte asymmetry that
    # makes content-hash dedup cheap at 100 TB).
    oracle="""
    SELECT SHA256(SUBSTRING(text, 1, 128)) AS block_sha,
           CAST(COUNT(*) AS BIGINT) AS n_copies,
           CAST(MIN(doc_id) AS BIGINT) AS survivor_id,
           CAST(MIN(OCTET_LENGTH(ENCODE(SUBSTRING(text, 1, 128))))
                AS BIGINT) AS n_bytes,
           CAST((COUNT(*) - 1)
                * MIN(OCTET_LENGTH(ENCODE(SUBSTRING(text, 1, 128))))
                AS BIGINT) AS reclaimable_bytes
    FROM documents
    GROUP BY SHA256(SUBSTRING(text, 1, 128))
    HAVING COUNT(*) > 1
    """,
)
def multimodal_payload_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = t(spark, sf_dir, "documents")
    block = F.encode(F.substring(F.col("text"), 1, 128), "UTF-8")
    hashed = d.select(
        F.sha2(block, 256).alias("block_sha"),
        F.col("doc_id"),
        F.length(block).cast("long").alias("nb"),
    )
    return (
        hashed.groupBy("block_sha")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_copies"),
            F.min("doc_id").cast("long").alias("survivor_id"),
            F.min("nb").cast("long").alias("n_bytes"),
        )
        .filter(F.col("n_copies") > 1)
        .select(
            "block_sha",
            "n_copies",
            "survivor_id",
            "n_bytes",
            ((F.col("n_copies") - 1) * F.col("n_bytes")).alias(
                "reclaimable_bytes"
            ),
        )
    )

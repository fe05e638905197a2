"""Multimodal plumbing tests: Arrow-batch shapes, fan-out arithmetic,
honest codec stubs (operators/multimodal.py)."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cirro_annotation_spark.operators import multimodal as M
from cirro_annotation_spark.suites.util import t


def _media(spark, sf_dir, n=20):
    d = t(spark, sf_dir, "documents").limit(n)
    return M.attach_binary_payload(d, "text", "doc_id")


def test_frame_sample_fanout_and_lengths(spark, sf_dir):
    media = _media(spark, sf_dir)
    frames = M.frame_sample(media, n_frames=4)
    per_doc = (
        frames.groupBy("media_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("frame_len").alias("total"))
        .join(media.select("media_id", "n_bytes"), "media_id")
        .collect()
    )
    assert per_doc, "no media rows"
    for r in per_doc:
        assert r["n"] == 4  # one row per frame
        assert r["total"] == r["n_bytes"]  # frames tile the payload exactly


def test_frame_sample_deterministic(spark, sf_dir):
    media = _media(spark, sf_dir, n=5)
    a = sorted(map(tuple, M.frame_sample(media).collect()))
    b = sorted(map(tuple, M.frame_sample(media).collect()))
    assert a == b


def test_extract_features_drops_payload(spark, sf_dir):
    out = M.extract_features(_media(spark, sf_dir))
    assert "payload" not in out.columns  # blobs never travel past extract
    row = out.first()
    assert row["decoded_len"] == row["n_bytes"]
    assert 0 <= row["checksum"] < 997


def test_codec_stubs_raise(spark):
    with pytest.raises(NotImplementedError):
        M.FakeCodec.resize(b"x", 2, 2)
    with pytest.raises(NotImplementedError):
        M.FakeCodec.frame_sample(b"x", 2)


def test_resize_payloads_decimates_bytes(spark, sf_dir):
    media = _media(spark, sf_dir, n=10)
    out = M.resize_payloads(media, factor=2)
    joined = (
        out.select("media_id", F.col("n_bytes").alias("resized_bytes"))
        .join(media.select("media_id", "n_bytes"), "media_id")
        .collect()
    )
    assert joined
    for r in joined:
        assert r["resized_bytes"] == (r["n_bytes"] + 1) // 2  # every 2nd byte
    row = out.first()
    assert isinstance(row["payload"], (bytes, bytearray))

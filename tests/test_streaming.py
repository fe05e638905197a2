"""Structured Streaming coverage (SURVEY.md §2.10): batch/stream parity
for windowed aggregation, session-window semantics, stateful dedup.
"""
from __future__ import annotations

import os

from cirro_annotation_spark.streaming import events as STRM
from cirro_annotation_spark.suites.util import t


def _sorted_rows(df, cols):
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_batch_stream_parity_tumbling(spark, sf_dir):
    """The identical groupBy(window(...)) through readStream (complete
    mode, watermark never triggers at completion) equals the batch run —
    Structured Streaming's core promise."""
    batch = STRM.tumbling_agg(t(spark, sf_dir, "events"), "1 hour")
    stream = STRM.run_streaming_over_parquet(
        spark,
        os.path.join(sf_dir, "events.parquet"),
        lambda s: STRM.tumbling_agg(s, "1 hour"),
    )
    cols = ["window_start", "event_type", "n", "total_value"]
    assert _sorted_rows(batch, cols) == _sorted_rows(stream, cols)


def test_session_window_merges_gaps(spark):
    """Events < gap apart merge into one session; a > gap break splits."""
    rows = [
        (1, "2024-01-01 00:00:00", 7, "click", 1.0, "{}"),
        (2, "2024-01-01 00:30:00", 7, "click", 1.0, "{}"),  # same session
        (3, "2024-01-01 03:00:00", 7, "click", 1.0, "{}"),  # new session
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).selectExpr("event_id", "CAST(ts AS timestamp) ts", "user_id", "event_type", "value", "props")
    out = STRM.session_agg(df, "1 hour").collect()
    assert len(out) == 2
    by_start = {r["session_start"]: r["n_events"] for r in out}
    assert by_start["2024-01-01 00:00:00"] == 2
    assert by_start["2024-01-01 03:00:00"] == 1


def test_stream_dedup_watermark_counts(spark, sf_dir):
    """Stateful dedup on event_id: counts equal the batch distinct counts
    (testdata event_ids are unique, so dedup is a no-op — the point is the
    stateful operator runs and agrees with batch)."""
    stream_out = STRM.dedup_within_watermark(
        spark, os.path.join(sf_dir, "events.parquet")
    )
    batch = (
        t(spark, sf_dir, "events")
        .dropDuplicates(["event_id"])
        .groupBy("event_type")
        .count()
    )
    got = {(r["event_type"], r["n"]) for r in stream_out.collect()}
    want = {(r["event_type"], r["count"]) for r in batch.collect()}
    assert got == want

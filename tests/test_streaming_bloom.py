"""Bounded-state streaming bloom dedup (streaming/events.py)."""
from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(tmp_path, rows):
    """rows: list of (event_id, ts_us, user_id, event_type, value, props)"""
    import datetime

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.datetime(2024, 1, 1) for _ in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "event_type": pa.array([r[2] for r in rows], pa.string()),
            "value": pa.array([1.0 for _ in rows], pa.float64()),
            "props": pa.array(["{}" for _ in rows], pa.string()),
        }
    )
    path = str(tmp_path / "events.parquet")
    pq.write_table(t, path)
    return path


def test_no_duplicate_ever_passes(spark, tmp_path):
    """Planted duplicates: every event_id appears 3x — exactly one copy
    may survive (the bloom guarantees no false negatives: once seen,
    the bits are set)."""
    from cirro_annotation_spark.streaming.events import bloom_dedup_stream

    rows = [(i % 100, i % 7, "click") for i in range(300)]
    path = _write_events(tmp_path, rows)
    out = bloom_dedup_stream(spark, path).collect()
    ids = [r.event_id for r in out]
    assert len(ids) == len(set(ids)), "a duplicate event_id passed the bloom"


def test_unique_survival_at_sized_bloom(spark, tmp_path):
    """With m sized ~64 bits/key the false-positive drop rate is ~1e-8 —
    every unique key must survive at test scale, making the output
    EQUAL the exact first-seen set."""
    from cirro_annotation_spark.streaming.events import bloom_dedup_stream

    n = 2000
    rows = [(i, i % 11, "view") for i in range(n)]
    path = _write_events(tmp_path, rows)
    out = bloom_dedup_stream(spark, path).collect()
    assert sorted(r.event_id for r in out) == list(range(n))


def test_state_is_bounded(spark, tmp_path):
    """The state schema is a fixed array<long> per bucket — verify the
    operator accepts 10x more keys without growing the bucket count
    (the contract the watermark-dedup twin can't make)."""
    from cirro_annotation_spark.streaming.events import bloom_dedup_stream

    rows = [(i, 0, "view") for i in range(5000)]
    path = _write_events(tmp_path, rows)
    out = bloom_dedup_stream(spark, path, m_bits_per_bucket=1 << 16, n_buckets=4)
    # 5000 keys / 4 buckets ≈ 1250 keys × 3 bits each into 65536 bits —
    # load factor ~6%, fp ~2e-4: allow a handful of fp drops but the
    # state stayed 4 × 8 KiB however many keys arrived.
    n_out = out.count()
    assert 4990 <= n_out <= 5000


def test_bloom_non_multiple_of_64_bits(spark, sf_dir):
    """m_bits_per_bucket=1000 exercises the ceil word sizing: positions
    960-999 previously indexed past the word array (worker IndexError —
    code-review r15)."""
    import os

    from cirro_annotation_spark.streaming.events import bloom_dedup_stream

    path = os.path.join(sf_dir, "events.parquet")
    out = bloom_dedup_stream(spark, path, m_bits_per_bucket=1000, n_buckets=4)
    assert out.count() > 0

"""Streaming CDC apply (streaming/cdc.py): changelog → foreachBatch
latest-wins merge with tombstones, checkpointed for exactly-once
re-delivery. Controlled timeline, same style as the watermark/restart
tests in test_streaming.py."""
from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

from cirro_annotation_spark.streaming.cdc import run_cdc_stream


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "seq", "op", "payload"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), str(src / name))
    time.sleep(1.1)  # file-source ordering follows modification time


def _base(spark, path):
    return {
        (r["key"], r["payload"])
        for r in spark.read.parquet(path).collect()
    }


def test_cdc_stream_latest_wins_and_tombstones(spark, tmp_path):
    src = tmp_path / "changelog"
    src.mkdir()
    base = str(tmp_path / "base_table")

    # batch 0: two inserts; batch 1: update k1, insert k3, delete k2.
    _write(src, "b0.parquet", [
        (1, "2024-01-01 00:00:00", 1, "u", "v1"),
        (2, "2024-01-01 00:00:01", 2, "u", "v1"),
    ])
    _write(src, "b1.parquet", [
        (1, "2024-01-01 00:10:00", 3, "u", "v2"),
        (3, "2024-01-01 00:10:01", 4, "u", "v1"),
        (2, "2024-01-01 00:10:02", 5, "d", ""),
    ])

    run_cdc_stream(spark, str(src), base, max_files_per_trigger=1)
    assert _base(spark, base) == {(1, "v2"), (3, "v1")}


def test_cdc_stream_same_ts_seq_breaks_tie(spark, tmp_path):
    """Two updates at the SAME event time: the higher changelog seq wins
    (the Debezium/binlog ordering guarantee the merge must respect)."""
    src = tmp_path / "cl2"
    src.mkdir()
    base = str(tmp_path / "base2")
    _write(src, "b0.parquet", [
        (7, "2024-01-01 00:00:00", 10, "u", "first"),
        (7, "2024-01-01 00:00:00", 11, "u", "second"),
    ])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(7, "second")}


def test_cdc_stream_restart_does_not_reapply(spark, tmp_path):
    """Restart from the same checkpoint after new changelog arrives:
    only the new batch merges (a reapplied delete would resurrect
    nothing, but a reapplied stale update WOULD clobber — so re-delivery
    is the thing to pin)."""
    src = tmp_path / "cl3"
    src.mkdir()
    base = str(tmp_path / "base3")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 1, "u", "v1")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "v1")}

    # A LATER update lands; an out-of-order replay of b0 must not undo it.
    _write(src, "b1.parquet", [(1, "2024-01-01 01:00:00", 2, "u", "v2")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "v2")}

    # Third run with no new data: a no-op, not a re-merge.
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "v2")}

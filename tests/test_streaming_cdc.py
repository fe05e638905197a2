"""Streaming CDC apply (streaming/cdc.py): changelog → foreachBatch
latest-wins merge with tombstones, checkpointed for exactly-once
re-delivery. Controlled timeline, same style as the watermark/restart
tests in test_streaming.py."""
from __future__ import annotations

import time

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from cirro_annotation_spark.streaming.cdc import read_cdc_base, run_cdc_stream


def _write(src, name, rows):
    pdf = pd.DataFrame(rows, columns=["key", "ts", "seq", "op", "payload"])
    pdf["ts"] = pd.to_datetime(pdf["ts"]).astype("datetime64[us]")
    pq.write_table(pa.Table.from_pandas(pdf), str(src / name))
    time.sleep(1.1)  # file-source ordering follows modification time


def _base(spark, path):
    # The live view: the stored base retains tombstones + seq for
    # cross-batch ordering; readers filter them via read_cdc_base.
    return {
        (r["key"], r["payload"])
        for r in read_cdc_base(spark, path).collect()
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

def test_cdc_cross_batch_same_ts_lower_seq_does_not_clobber(spark, tmp_path):
    """Round-5 advisor case 1: a late-arriving duplicate with the SAME ts
    but a LOWER binlog seq than the already-applied row must lose. This
    requires the base to persist the winning row's real seq — a synthetic
    replay seq (the old seq=-1) loses to ANY changelog seq and clobbers."""
    src = tmp_path / "cl4"
    src.mkdir()
    base = str(tmp_path / "base4")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 20, "u", "new")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "new")}

    # Late re-delivery of the OLDER event at the same ts, lower seq.
    _write(src, "b1.parquet", [(1, "2024-01-01 00:00:00", 10, "u", "stale")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "new")}


def test_cdc_late_upsert_does_not_resurrect_deleted_key(spark, tmp_path):
    """Round-5 advisor case 2: an upsert OLDER than an applied delete
    arrives in a later micro-batch. The retained tombstone must keep the
    key dead — dropping tombstones at write time forgets the delete's
    (ts, seq) and resurrects it."""
    src = tmp_path / "cl5"
    src.mkdir()
    base = str(tmp_path / "base5")
    _write(src, "b0.parquet", [
        (1, "2024-01-01 00:00:00", 1, "u", "v1"),
        (1, "2024-01-01 01:00:00", 2, "d", ""),
    ])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == set()

    # Late upsert from BEFORE the delete: stays dead.
    _write(src, "b1.parquet", [(1, "2024-01-01 00:30:00", 9, "u", "zombie")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == set()

    # A genuinely NEWER upsert after the delete does revive the key.
    _write(src, "b2.parquet", [(1, "2024-01-01 02:00:00", 10, "u", "reborn")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(1, "reborn")}


def test_cdc_tombstone_only_base_remains_readable(spark, tmp_path):
    """Every key deleted in batch 0: the base must still be a readable,
    schema'd table (the old swap wrote a part-file-less dir that
    schema-less reads could not infer)."""
    src = tmp_path / "cl6"
    src.mkdir()
    base = str(tmp_path / "base6")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 1, "d", "")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == set()

    # And the next batch merges on top of the empty-live base fine.
    _write(src, "b1.parquet", [(2, "2024-01-01 00:01:00", 2, "u", "v1")])
    run_cdc_stream(spark, str(src), base)
    assert _base(spark, base) == {(2, "v1")}


def test_cdc_swap_crash_between_renames_recovers(spark, tmp_path):
    """Simulate a crash between rename(base->old) and rename(staging->
    base): base absent, base.old present. The next reader/merger must
    roll back (or forward to a complete staging dir), never see zero
    bases (round-5 advisor: the rmtree-then-rename swap could)."""
    import os

    src = tmp_path / "cl7"
    src.mkdir()
    base = str(tmp_path / "base7")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 1, "u", "v1")])
    run_cdc_stream(spark, str(src), base)

    # Crash window: base renamed aside, staged result not yet in place.
    os.rename(base, base + ".old")
    assert _base(spark, base) == {(1, "v1")}  # rolled back transparently
    assert not os.path.exists(base + ".old")

    # Crash window variant: a COMPLETE staging dir exists -> roll forward.
    from cirro_annotation_spark.streaming.cdc import BASE_SCHEMA

    staged = base + ".staging-deadbeef"
    spark.read.schema(BASE_SCHEMA).parquet(base).withColumn(
        "payload", F.lit("v2")
    ).write.parquet(staged)
    os.rename(base, base + ".old")
    assert _base(spark, base) == {(1, "v2")}
    assert not os.path.exists(base + ".old")
    assert not os.path.exists(staged)


def test_cdc_tombstone_horizon_prunes_old_tombstones(spark, tmp_path):
    """With a horizon, tombstones older than max(ts)-horizon compact
    away (Kafka delete.retention.ms semantics); recent ones survive."""
    src = tmp_path / "cl8"
    src.mkdir()
    base = str(tmp_path / "base8")
    _write(src, "b0.parquet", [
        (1, "2024-01-01 00:00:00", 1, "d", ""),   # ancient tombstone
        (2, "2024-01-10 00:00:00", 2, "d", ""),   # recent tombstone
        (3, "2024-01-10 00:00:01", 3, "u", "v1"),
    ])
    run_cdc_stream(spark, str(src), base, tombstone_horizon="'2' DAYS")
    stored = spark.read.parquet(base)
    ops = {(r["key"], r["op"]) for r in stored.collect()}
    assert (1, "d") not in ops          # pruned: older than horizon
    assert (2, "d") in ops              # retained: within horizon
    assert _base(spark, base) == {(3, "v1")}


def test_cdc_recover_prefers_newest_staging_by_mtime(spark, tmp_path):
    """Two complete staging dirs (a leaked older one + the correct newer
    one): recovery must promote by MTIME, not lexical name order — a
    lexical sort over random suffixes promoted the stale snapshot with
    ~50% probability and deleted both the good base and the right
    staged result (code-review r15)."""
    import os
    import time

    from cirro_annotation_spark.streaming.cdc import BASE_SCHEMA

    src = tmp_path / "cl9"
    src.mkdir()
    base = str(tmp_path / "base9")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 1, "u", "v1")])
    run_cdc_stream(spark, str(src), base)

    # stale leaked staging dir: lexically LAST ("zzz" > any digit), old mtime
    stale = base + ".staging-zzz"
    spark.read.schema(BASE_SCHEMA).parquet(base).withColumn(
        "payload", F.lit("stale")
    ).write.parquet(stale)
    t_old = time.time() - 1000
    os.utime(stale, (t_old, t_old))
    # correct newer staging dir
    good = base + ".staging-0001"
    spark.read.schema(BASE_SCHEMA).parquet(base).withColumn(
        "payload", F.lit("v2")
    ).write.parquet(good)

    os.rename(base, base + ".old")
    assert _base(spark, base) == {(1, "v2")}
    assert not os.path.exists(stale) and not os.path.exists(good)


def test_cdc_successful_swap_cleans_leaked_staging(spark, tmp_path):
    """A staging dir leaked by an earlier crash must not survive a later
    SUCCESSFUL merge — recovery would otherwise consider promoting it
    forever (code-review r15)."""
    import os

    src = tmp_path / "cl10"
    src.mkdir()
    base = str(tmp_path / "base10")
    _write(src, "b0.parquet", [(1, "2024-01-01 00:00:00", 1, "u", "v1")])
    run_cdc_stream(spark, str(src), base)

    leaked = base + ".staging-leftover"
    os.makedirs(leaked)
    _write(src, "b1.parquet", [(1, "2024-01-02 00:00:00", 2, "u", "v2")])
    run_cdc_stream(spark, str(src), base)
    assert not os.path.exists(leaked)
    assert _base(spark, base) == {(1, "v2")}

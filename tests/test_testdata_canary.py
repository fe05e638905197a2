"""Testdata physical-type canary (round-4 postmortem, VERDICT items 3/4).

The driver regenerates /root/testdata between rounds and has already
shipped ``events.ts`` as parquet TIMESTAMP(NANOS) (round 3) and as plain
micros (round 4); the round-4 switch broke 9 queries because the read
paths assumed nanos. These tests make the NEXT silent regeneration fail
in pytest, not in the driver:

- the real testdata must normalize to a proper TIMESTAMP through
  ``suites.util.t`` with a sane, non-collapsed timeline;
- synthetic nanos / micros / millis / NTZ-inferred files must all come
  out of ``catalog.read_table`` AND the streaming reader with identical
  values — both eras (and the one we haven't seen yet) stay covered even
  after the testdata moves on;
- a 1000x-collapsed timeline must be DETECTABLE by the windowed parity
  comparison (the round-4 streaming bug was "green by luck" in three
  twins whose outputs didn't expose window starts).
"""
from __future__ import annotations

import datetime as dt
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from cirro_annotation_spark.catalog import read_table, table_path
from cirro_annotation_spark.session import parquet_ts_unit
from cirro_annotation_spark.streaming import events as STRM
from cirro_annotation_spark.suites.util import t

# One known timeline, expressed in every parquet storage flavor. Spacing
# is hours so a 1000x collapse (the round-4 failure mode) is glaring.
_BASE_US = 1_700_000_000_000_000  # 2023-11-14 22:13:20 UTC
_TS_US = [_BASE_US + i * 3_600_000_000 for i in range(6)]
_EXPECTED = [
    dt.datetime.utcfromtimestamp(us / 1_000_000) for us in _TS_US
]


def _write_events_flavor(path: str, unit: str) -> None:
    """Full events-schema parquet with ts stored at the given unit."""
    scale = {"ns": 1_000, "us": 1, "ms": 1 / 1_000}[unit]
    ts = pa.array([int(us * scale) for us in _TS_US], pa.timestamp(unit))
    n = len(_TS_US)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": ts,
            "user_id": pa.array([7] * n, pa.int64()),
            "event_type": pa.array(["click"] * n, pa.string()),
            "value": pa.array([1.0] * n, pa.float64()),
            "props": pa.array(["{}"] * n, pa.string()),
        }
    )
    pq.write_table(table, path)


def _ts_values(df):
    return [r["ts"] for r in df.select("ts").orderBy("event_id").collect()]


def test_real_testdata_ts_is_timestamp_and_uncollapsed(spark, sf_dir):
    """The driver-facing read of the REAL events table: proper
    TimestampType, plausible epoch, and a timeline that spans real time
    (a 1000x collapse squeezes sf0.001's multi-day range under a minute)."""
    ev = t(spark, sf_dir, "events")
    assert isinstance(ev.schema["ts"].dataType, TimestampType), ev.schema["ts"]
    lo, hi = ev.agg(F.min("ts"), F.max("ts")).first()
    assert 2000 <= lo.year <= 2100, lo
    assert hi - lo > dt.timedelta(hours=1), (lo, hi)


def test_real_testdata_unit_peek_matches_spark_schema(spark, sf_dir):
    """The footer peek and Spark agree on what the file stores — if the
    driver regenerates with a new flavor, this names it explicitly."""
    unit = parquet_ts_unit(table_path(sf_dir, "events"))
    assert unit in ("ns", "us", "ms"), unit


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_read_table_normalizes_every_storage_flavor(spark, tmp_path, unit):
    path = str(tmp_path / f"events_{unit}.parquet")
    _write_events_flavor(path, unit)
    assert parquet_ts_unit(path) == unit
    df = read_table(spark, path)
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert _ts_values(df) == _EXPECTED


def test_read_table_normalizes_inferred_ntz(spark, tmp_path):
    """The exact round-4 driver condition: a micros file read on a
    session with Spark 4's default inferTimestampNTZ=true arrives as
    TIMESTAMP_NTZ; read_table's cast branch must absorb it even when
    nothing reset the inference conf."""
    path = str(tmp_path / "events_ntz.parquet")
    _write_events_flavor(path, "us")
    before = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        raw_kind = spark.read.parquet(path).schema["ts"].dataType.simpleString()
        assert raw_kind == "timestamp_ntz", raw_kind  # precondition holds
        df = read_table(spark, path)
        assert isinstance(df.schema["ts"].dataType, TimestampType)
        assert _ts_values(df) == _EXPECTED
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", before)


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_streaming_reader_matches_batch_per_flavor(spark, tmp_path, unit):
    """The streaming schema peek picks the right (schema, normalization)
    pair: tumbling windows through the stream equal the batch run over
    the same file, WINDOW-START VALUES included — the assertion the
    round-4 collapse slipped past in the count-only twins."""
    path = str(tmp_path / f"stream_{unit}.parquet")
    _write_events_flavor(path, unit)
    batch = STRM.tumbling_agg(read_table(spark, path), "1 hour")
    stream = STRM.run_streaming_over_parquet(
        spark, path, lambda s: STRM.tumbling_agg(s, "1 hour")
    )
    cols = ["window_start", "event_type", "n", "total_value"]
    key = lambda df: sorted(tuple(r[c] for c in cols) for r in df.collect())
    got = key(stream)
    assert got == key(batch)
    assert len(got) == len(_TS_US)  # one window per hourly event


def test_parity_comparison_detects_collapsed_timeline(spark, sf_dir):
    """Guard on the GUARD: if the testdata's time density ever makes a
    1000x-collapsed timeline produce the same tumbling windows as the
    real one, the parity tests above lose their sensitivity silently.
    Pin that the collapse is visible in window_start space."""
    ev = t(spark, sf_dir, "events")
    collapsed = ev.withColumn(
        "ts", F.timestamp_micros(F.expr("unix_micros(ts) div 1000"))
    )
    real = {r["window_start"] for r in STRM.tumbling_agg(ev, "1 hour").collect()}
    fake = {
        r["window_start"]
        for r in STRM.tumbling_agg(collapsed, "1 hour").collect()
    }
    assert real != fake
    assert len(real) > len(fake)  # collapse merges windows, never splits


def test_read_table_restores_nanos_conf(spark, tmp_path):
    """Round-5 advisor: the nanos legacy conf must not leak session-wide.
    After read_table on a nanos file, the hosting session's conf is back
    to its prior state — a LATER raw nanos read must error loudly, not
    silently arrive as bigint — while the returned frame still collects
    correctly (schema was resolved while the conf held)."""
    path = str(tmp_path / "events_ns_conf.parquet")
    _write_events_flavor(path, "ns")

    conf_key = "spark.sql.legacy.parquet.nanosAsLong"
    before = spark.conf.get(conf_key, None)
    df = read_table(spark, path)
    assert spark.conf.get(conf_key, None) == before
    assert _ts_values(df) == _EXPECTED


def test_read_table_leaves_genuine_long_ts_untouched(spark, tmp_path):
    """Round-5 advisor: div-1000 is gated on the FOOTER saying nanos. A
    genuinely long-typed ts column (here: epoch micros as plain int64)
    must pass through untouched, not get misscaled 1000x."""
    n = len(_TS_US)
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "ts": pa.array(_TS_US, pa.int64()),  # plain long, NOT timestamp
            "user_id": pa.array([7] * n, pa.int64()),
        }
    )
    path = str(tmp_path / "events_long_ts.parquet")
    pq.write_table(table, path)
    assert parquet_ts_unit(path) is None

    df = read_table(spark, path)
    assert df.schema["ts"].dataType.simpleString() == "bigint"
    vals = [r["ts"] for r in df.orderBy("event_id").collect()]
    assert vals == _TS_US


def test_parquet_ts_unit_cache_invalidates_on_regeneration(tmp_path):
    """Round-5 advisor: the footer-peek cache must not survive in-place
    file regeneration (the exact driver scenario it defends against) —
    key is (path, mtime, size), not path alone."""
    import os
    import time

    path = str(tmp_path / "regen.parquet")
    _write_events_flavor(path, "ns")
    assert parquet_ts_unit(path) == "ns"

    time.sleep(0.01)
    _write_events_flavor(path, "us")
    # Force a distinct mtime even on coarse-mtime filesystems.
    st = os.stat(path)
    os.utime(path, ns=(st.st_atime_ns, st.st_mtime_ns + 1_000_000))
    assert parquet_ts_unit(path) == "us"

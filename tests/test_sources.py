"""Source-format robustness: ORC, compression codecs, corrupt-record
handling, output file-size control — the operational surface of a
100 TB ingest beyond the happy path."""
from __future__ import annotations

import glob
import json
import os

import pytest
from pyspark.sql import functions as F

from cirro_annotation_spark.suites.util import t


def test_orc_roundtrip(spark, sf_dir, tmp_path):
    """ORC is the other columnar lakehouse format Spark speaks natively;
    the engine's scan/sink surface covers it with the same API."""
    target = str(tmp_path / "nation_orc")
    df = t(spark, sf_dir, "nation")
    df.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


def test_parquet_zstd_roundtrip(spark, sf_dir, tmp_path):
    """zstd is the default production codec choice (better ratio than
    snappy at similar speed); values must round-trip unchanged."""
    target = str(tmp_path / "region_zstd")
    df = t(spark, sf_dir, "region")
    df.write.mode("overwrite").option("compression", "zstd").parquet(target)
    files = glob.glob(os.path.join(target, "*.zstd.parquet"))
    assert files, os.listdir(target)
    back = spark.read.parquet(target)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, df.collect()))


@pytest.fixture()
def dirty_jsonl(tmp_path):
    path = tmp_path / "dirty.jsonl"
    lines = [
        json.dumps({"id": 1, "v": "ok"}),
        "{this is not json",
        json.dumps({"id": 3, "v": "fine"}),
    ]
    path.write_text("\n".join(lines) + "\n")
    return str(path)


def test_permissive_mode_captures_corrupt_records(spark, dirty_jsonl):
    """Dirty data is the norm at corpus scale: PERMISSIVE mode must keep
    good rows AND surface bad ones in _corrupt_record for quarantine
    instead of failing the whole ingest."""
    df = spark.read.schema("id long, v string, _corrupt_record string").json(
        dirty_jsonl
    )
    rows = df.collect()
    good = {(r["id"], r["v"]) for r in rows if r["_corrupt_record"] is None}
    bad = [r["_corrupt_record"] for r in rows if r["_corrupt_record"] is not None]
    assert good == {(1, "ok"), (3, "fine")}
    assert len(bad) == 1 and bad[0].startswith("{this")


def test_failfast_mode_raises_on_corrupt_records(spark, dirty_jsonl):
    """FAILFAST is the validation-gate twin: any malformed record aborts.
    (The executor-side SparkException surfaces as a Py4J error wrapper,
    so assert on the failure reason, not the Python exception type.)"""
    df = spark.read.schema("id long, v string").option("mode", "FAILFAST").json(
        dirty_jsonl
    )
    with pytest.raises(Exception, match="FAILFAST|MALFORMED|Malformed"):
        df.collect()


def test_max_records_per_file_bounds_output_files(spark, sf_dir, tmp_path):
    """maxRecordsPerFile caps output file size without a repartition —
    the knob that stops one fat task from writing a 100 GB file."""
    target = str(tmp_path / "docs_chunked")
    d = t(spark, sf_dir, "documents").select("doc_id", "lang").coalesce(1)
    d.write.option("maxRecordsPerFile", 100).mode("overwrite").parquet(target)
    files = glob.glob(os.path.join(target, "part-*.parquet"))
    n = d.count()
    assert len(files) >= n // 100  # one writer still splits into ≤100-row files
    for f in files:
        assert spark.read.parquet(f).count() <= 100


def test_sniff_via_hadoop_fs_scheme_path(spark, tmp_path):
    """A scheme-qualified path ('file://...') must sniff through the
    Hadoop FileSystem API — the cloud-storage code path — and agree
    with the local-open result."""
    from cirro_annotation_spark.sources.dsv import sniff_separator

    p = tmp_path / "t.tsv"
    p.write_text("a\tb\tc\n1\t2\t3\n")
    assert sniff_separator(str(p)) == "\t"
    assert sniff_separator("file://" + str(p), spark) == "\t"


def test_sniff_gz_truncation_tolerant(tmp_path):
    """gz sniffing decompresses a HEAD slice tolerantly (no EOFError on
    the truncated member) — pin with a file larger than the sniff
    window."""
    import gzip as _gzip

    from cirro_annotation_spark.sources.dsv import sniff_separator

    p = tmp_path / "big.csv.gz"
    body = "x,y,z\n" + "\n".join(f"{i},{i},{i}" for i in range(200_000))
    with _gzip.open(p, "wt") as f:
        f.write(body)
    assert sniff_separator(str(p)) == ","

"""Sink coverage: parquet (the declared hot.Parquet target), data-plane
JSON, and manifest JSON metadata round-trips."""
from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from cirro_annotation_spark.suites.util import t


def test_parquet_sink_roundtrip(spark, sf_dir, tmp_path):
    target = str(tmp_path / "out.parquet")
    df = t(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    df.write.mode("overwrite").parquet(target)
    back = spark.read.parquet(target)
    assert back.count() == df.count()
    assert set(back.columns) == {"n_nationkey", "n_name"}


def test_json_sink_roundtrip(spark, sf_dir, tmp_path):
    """Data-plane JSON (sink_json_metadata's data-side analog,
    SURVEY §2.1 row 8): types survive the round-trip for the JSON-able
    subset (long/string/double)."""
    target = str(tmp_path / "out.json")
    df = t(spark, sf_dir, "region").select("r_regionkey", "r_name")
    df.coalesce(1).write.mode("overwrite").json(target)
    back = spark.read.json(target)
    rows = {(r["r_regionkey"], r["r_name"]) for r in back.collect()}
    want = {(r["r_regionkey"], r["r_name"]) for r in df.collect()}
    assert rows == want


def test_manifest_json_metadata_sink(spark, tmp_path):
    """The reference writes manifest.json at the dataset root
    (run_annotate.py:321-326); our Manifest.to_json round-trips through a
    file the same way."""
    from cirro_annotation_spark.manifest.fixtures import build_fixture_tree
    from cirro_annotation_spark.manifest.model import load_manifest
    from cirro_annotation_spark.manifest.planner import build_manifest

    data = build_fixture_tree(str(tmp_path))
    m = build_manifest(spark, data)
    path = os.path.join(str(tmp_path), "manifest.json")
    with open(path, "w") as f:
        f.write(m.to_json())
    with open(path) as f:
        loaded = load_manifest(json.load(f))
    assert len(loaded.commands) == len(m.commands)
    assert {c.target for c in loaded.commands} == {c.target for c in m.commands}


def test_partitioned_parquet_write_prunes_partitions(spark, sf_dir, tmp_path):
    """The 100 TB layout pattern: write partitioned by a low-cardinality
    gate column, and a reader filtering on it must prune at the FILE
    level (PartitionFilters in the scan, non-matching directories never
    read). This is what makes lang/source/bucket gates free at scale."""
    from cirro_annotation_spark.plans import physical_plan

    target = str(tmp_path / "docs_by_lang")
    t(spark, sf_dir, "documents").select("doc_id", "lang", "source").write.mode(
        "overwrite"
    ).partitionBy("lang").parquet(target)

    back = spark.read.parquet(target).filter(F.col("lang") == "en")
    plan = physical_plan(back)
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0]
    en_dir = os.path.join(target, "lang=en")
    assert os.path.isdir(en_dir)
    want = t(spark, sf_dir, "documents").filter(F.col("lang") == "en").count()
    assert back.count() == want


def test_bucketed_table_write(spark, sf_dir, tmp_path):
    """bucketBy sink: pay the shuffle once at write time; co-located
    reads join bucket-to-bucket without an exchange (the read-side proof
    is tests/test_bucketing.py)."""
    name = "docs_bucketed_sink_test"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    (
        t(spark, sf_dir, "documents")
        .select("doc_id", "lang")
        .write.bucketBy(4, "doc_id")
        .sortBy("doc_id")
        .mode("overwrite")
        .saveAsTable(name)
    )
    back = spark.table(name)
    assert back.count() == t(spark, sf_dir, "documents").count()
    spark.sql(f"DROP TABLE IF EXISTS {name}")


def test_dynamic_partition_overwrite_refreshes_one_partition(spark, sf_dir, tmp_path):
    """Incremental corpus refresh: with partitionOverwriteMode=dynamic,
    rewriting ONE lang partition leaves every other partition's files
    untouched — the update pattern for a partitioned 100 TB corpus
    (static mode would wipe the whole root)."""
    target = str(tmp_path / "docs_dyn")
    base = t(spark, sf_dir, "documents").select("doc_id", "lang", "source")
    base.write.mode("overwrite").partitionBy("lang").parquet(target)
    before = {
        lang: spark.read.parquet(target).filter(F.col("lang") == lang).count()
        for lang in ("en", "de")
    }

    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        refreshed = base.filter(F.col("lang") == "en").limit(10)
        refreshed.write.mode("overwrite").partitionBy("lang").parquet(target)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "static")

    back = spark.read.parquet(target)
    assert back.filter(F.col("lang") == "en").count() == 10  # replaced
    assert back.filter(F.col("lang") == "de").count() == before["de"]  # intact


def test_orc_sink_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is Spark-native (no extra package): round-trip the documents
    table and confirm predicate pushdown reaches the ORC scan — the
    columnar-format coverage beyond parquet. Schema and values must
    survive exactly."""
    target = str(tmp_path / "docs.orc")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.write.mode("overwrite").orc(target)
    back = spark.read.orc(target)
    assert back.schema == df.schema
    assert back.count() == df.count()
    assert (
        back.filter(F.col("lang") == "en").count()
        == df.filter(F.col("lang") == "en").count()
    )
    plan = (
        back.filter(F.col("n_chars") > 100)
        .select("doc_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the filter must reach the ORC scan as a pushed filter
    assert "PushedFilters: [" in plan and "n_chars" in plan


def test_orc_partitioned_write_prunes(spark, sf_dir, tmp_path):
    target = str(tmp_path / "docs_part.orc")
    df = spark.read.parquet(f"{sf_dir}/documents.parquet")
    df.write.mode("overwrite").partitionBy("lang").orc(target)
    back = spark.read.orc(target).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    assert back.count() == df.filter(F.col("lang") == "en").count()

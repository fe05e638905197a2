"""Manifest-pipeline queries: the reference's entire declared capability
run end-to-end (SURVEY.md §3.2) on the FIXTURES.md §B DSV tree.

These operate on synthesized DSV files rather than the registered parquet
views, so they are rows-only checks here; the exact golden-output
verification lives in tests/test_manifest.py.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cirro_annotation_spark.manifest.compiler import compile_command
from cirro_annotation_spark.manifest.fixtures import (
    FIELDS_DICTIONARY,
    build_fixture_tree,
)
from cirro_annotation_spark.manifest.planner import build_manifest
from cirro_annotation_spark.registry import query

_FIXTURE_DIR: str | None = None


def fixture_data_dir() -> str:
    """Build (once per process) the FIXTURES.md §B tree in a temp dir."""
    global _FIXTURE_DIR
    if _FIXTURE_DIR is None or not os.path.isdir(_FIXTURE_DIR):
        root = tempfile.mkdtemp(prefix="cirro_fixture_")
        _FIXTURE_DIR = build_fixture_tree(root)
    return _FIXTURE_DIR


def _manifest(spark: SparkSession):
    return build_manifest(
        spark,
        fixture_data_dir(),
        variable_templates=["mageck/[gene]/rra.sgrna_summary.txt"],
        melt_groups={
            "mageck/count/combined/counts.txt": [
                "ctrl_r1",
                "ctrl_r2",
                "treat_r1",
                "treat_r2",
            ]
        },
        dictionary=FIELDS_DICTIONARY,
    )


def _command(spark: SparkSession, target: str):
    for cmd in _manifest(spark).commands:
        if cmd.target == target:
            return cmd
    raise KeyError(target)


@query("manifest_variable_family")  # DSV inputs — rows-only; golden test in pytest
def manifest_variable_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan_glob_tokens + concat_union_tokens: the 3-gene family unions into
    one frame with the [gene] path token as a column (150 rows = 3×50)."""
    cmd = _command(spark, "rra_sgrna_summary.parquet")
    return compile_command(spark, cmd, fixture_data_dir()).orderBy("gene", "sgrna")


@query("manifest_melt_standard")  # rows-only; golden test in pytest
def manifest_melt_standard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scan_dsv_sniffed + normalize + project_rename + melt_unpivot: the
    counts file folds 4 sample columns into (sample, reads) long form."""
    cmd = _command(spark, "counts.parquet")
    return compile_command(spark, cmd, fixture_data_dir()).orderBy(
        "sgrna", "sample"
    )


@query("manifest_project_dictionary")  # rows-only; golden test in pytest
def manifest_project_dictionary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dictionary-resolved projection of the summary CSV (sniffed comma sep)."""
    cmd = _command(spark, "summary.parquet")
    return compile_command(spark, cmd, fixture_data_dir()).orderBy("sample")


@query("manifest_harvest_columns")  # rows-only
def manifest_harvest_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """harvest_columns + discover_files as a queryable frame
    (file → normalized column inventory, run_annotate.py:30-50)."""
    from cirro_annotation_spark.sources.discovery import discover_files
    from cirro_annotation_spark.sources.dsv import harvest_columns

    data = fixture_data_dir()
    files = discover_files(data)
    harvested = harvest_columns(spark, data, files)
    rows = [(f, c) for f, cols in sorted(harvested.items()) for c in cols]
    return spark.createDataFrame(rows, "file string, column string").orderBy(
        "file", "column"
    )


@query("manifest_roundtrip_tokens")  # rows-only
def manifest_roundtrip_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Property check as a query: [tok] template → regex → extracted values
    equals the values the glob saw (run_annotate.py:133-144 semantics)."""
    cmd = _command(spark, "rra_sgrna_summary.parquet")
    df = compile_command(spark, cmd, fixture_data_dir())
    return df.groupBy("gene").agg(F.count(F.lit(1)).alias("n_rows")).orderBy("gene")

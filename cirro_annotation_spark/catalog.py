"""Catalog: load the test tables as temp views.

Mirrors the reference's "dataset = directory of files, one frame per
file" model (run_annotate.py:54-66, 69-101) as a Spark catalog namespace:
one DataFrame per parquet table, registered as a temp view so both the
DataFrame API and spark.sql can address it.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Read every table under ``sf_dir`` and register temp views.

    Plain ``spark.read.parquet`` keeps the scan lazy and column-prunable;
    no caching here — callers decide what is hot.
    """
    out: dict[str, DataFrame] = {}
    for name in TABLES:
        path = table_path(sf_dir, name)
        if not os.path.exists(path):
            continue
        df = spark.read.parquet(path)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out

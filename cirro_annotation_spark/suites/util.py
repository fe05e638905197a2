"""Shared helpers for the query suites.

Conventions that keep the Spark query and the DuckDB oracle hash-equal:

- Every computed column is aliased identically on both sides (the driver
  sorts columns by NAME before hashing values).
- Double-typed aggregates are rounded at a fixed precision on BOTH
  sides: engines sum floats in different orders, so raw sums differ in
  the last ulps; rounding makes them identical while keeping 10+
  significant digits on money-scale values.
- Timestamps are compared in UTC (session TZ pinned in session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from cirro_annotation_spark.catalog import table_path

# Rounding precisions (shared between Spark code and oracle SQL).
MONEY = 2  # sums of prices — absolute error of a 60k-row double sum ≈ 1e-7
RATIO = 6  # averages / ratios / similarities


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table lazily (scan stays prunable/pushdown-able).

    events.parquet stores ``ts`` as parquet TIMESTAMP(NANOS), which Spark's
    vectorized reader rejects outright (PARQUET_TYPE_ILLEGAL). We read the
    nanos as a plain long (legacy conf, runtime-settable — set here because
    the driver invokes query callables on its own session without going
    through our session factory) and normalize to a real timestamp column,
    truncating to microseconds exactly like DuckDB/pandas do, so oracle
    comparisons line up. The conversion is a cheap per-row projection that
    pipelines inside the scan stage — no shuffle, scale-neutral.
    """
    # Full runtime tuning, not just the nanos conf: the driver invokes
    # query callables on its OWN session, and oracle parity needs the
    # UTC session timezone (date_format/window queries) as much as the
    # nanos read conf. tune_existing is idempotent and swallows locked
    # confs, so calling it per-read is safe and makes every query
    # self-sufficient on any session.
    from cirro_annotation_spark.session import tune_existing

    tune_existing(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    for f in df.schema.fields:
        if f.name == "ts" and f.dataType.simpleString() == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df

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

from pyspark.sql import DataFrame, SparkSession

from cirro_annotation_spark.catalog import table_path

# Rounding precisions (shared between Spark code and oracle SQL).
MONEY = 2  # sums of prices — absolute error of a 60k-row double sum ≈ 1e-7
RATIO = 6  # averages / ratios / similarities


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one catalog table lazily (scan stays prunable/pushdown-able).

    The driver invokes query callables on its OWN session, so every read
    must be self-sufficient: tune_existing pins the runtime confs oracle
    parity needs (UTC session timezone, NTZ inference off — idempotent,
    swallows locked confs), and catalog.read_table normalizes the ``ts``
    column to a proper TIMESTAMP whatever the parquet file physically
    stores (nanos-as-long, micros-inferred-NTZ, or plain timestamp — the
    testdata has shipped all three across driver regenerations). Every
    downstream ``unix_micros``/window/watermark call site relies on this
    normalization; none may read events raw.
    """
    from cirro_annotation_spark.catalog import read_table
    from cirro_annotation_spark.session import tune_existing

    tune_existing(spark)
    return read_table(spark, table_path(sf_dir, name))

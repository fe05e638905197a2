"""SparkSession factory with scale-appropriate defaults.

Local testing runs ``local[$SPARK_GRAFT_CPUS]`` (default 32); the same
config block is what we would ship to a 1000-executor cluster, minus the
master/memory lines which are deployment-specific.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(app_name: str = "cirro_annotation_spark") -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    - AQE on: runtime partition coalescing + skew-join handling, the
      scale levers that matter at 100 TB.
    - shuffle.partitions = local cores (cluster deployments override to
      ~2-3x total cores; AQE coalesces down from there).
    - session timezone pinned to UTC so timestamp semantics match the
      DuckDB oracle (UTC-naive) and are deployment-independent.
    - Arrow on for the few pandas-UDF paths (similarity, multimodal).
    """
    cpus = default_parallelism()
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        # testdata events.parquet stores ts as TIMESTAMP(NANOS), which the
        # vectorized reader rejects (PARQUET_TYPE_ILLEGAL); read nanos as
        # long and normalize to timestamp in suites/util.t().
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Runtime bloom-filter join pruning: build a bloom of the small
        # side's join keys and push it into the big side's scan — at
        # 100 TB this skips row groups the join would discard anyway.
        .config("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def tune_existing(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable tuning to a session we did not build.

    The driver hands ``entry(spark)``/``queries()`` an existing session;
    memory/master are fixed by then, but SQL confs are still settable.
    """
    for k, v in (
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.shuffle.partitions", str(default_parallelism())),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf locked by the hosting driver; keep going
    return spark

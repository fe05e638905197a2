"""Execute a manifest: compile every command, sink each to Parquet.

The only sink the reference declares is ``hot.Parquet``
(run_annotate.py:188, 227). Writes are mode=overwrite for idempotent
re-runs; each command's pipeline is shuffle-free, so output parallelism
equals scan parallelism (repartition knob provided for small-files
control at the sink — the classic 100 TB hygiene issue).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from cirro_annotation_spark.manifest.compiler import compile_command
from cirro_annotation_spark.manifest.model import Manifest


def execute_manifest(
    spark: SparkSession,
    manifest: Manifest,
    data_directory: str,
    output_directory: str,
    coalesce_small: int | None = None,
) -> dict[str, DataFrame]:
    """Run every command; returns {target_path: result_df} for inspection."""
    results: dict[str, DataFrame] = {}
    for cmd in manifest.commands:
        if cmd.command != "hot.Parquet":
            raise ValueError(f"unknown manifest command: {cmd.command}")
        df = compile_command(spark, cmd, data_directory)
        # cmd.target is manifest input: confine it to output_directory
        # (an absolute or '..'-laden target would overwrite arbitrary
        # writable paths under mode=overwrite — code-review r15, same
        # contract as sources/remote.py's catalog-path validation).
        if os.path.isabs(cmd.target) or ".." in cmd.target.split("/"):
            raise ValueError(
                f"manifest target escapes the output directory: {cmd.target!r}"
            )
        target = os.path.join(output_directory, cmd.target)
        writer = df.coalesce(coalesce_small) if coalesce_small else df
        writer.write.mode("overwrite").parquet(target)
        results[target] = spark.read.parquet(target)
    return results

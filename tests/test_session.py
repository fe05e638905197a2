"""Session tuning contract: runtime-settable confs only, and the
split-sizing knob's env override (ADVICE r7 — without it, big inputs
under the fixture-shaped 1 MB default get pathological task counts
with no recourse but a code change)."""
from __future__ import annotations

from cirro_annotation_spark.session import tune_existing


def test_max_partition_bytes_env_override(spark, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_MAX_PARTITION_BYTES", "128m")
    try:
        tune_existing(spark)
        assert spark.conf.get("spark.sql.files.maxPartitionBytes") == "128m"
    finally:
        monkeypatch.delenv("SPARK_GRAFT_MAX_PARTITION_BYTES")
        tune_existing(spark)  # restore the harness default for the suite
    assert spark.conf.get("spark.sql.files.maxPartitionBytes") == str(
        1024 * 1024
    )

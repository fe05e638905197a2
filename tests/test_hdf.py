"""HDF→Parquet conversion (north-star headline) exercised end-to-end with
the fake chunk iterator (h5py is not in this container — the decode step
is honestly gated; the Spark-side pipeline is real).
"""
from __future__ import annotations

import pandas as pd
import pytest

from cirro_annotation_spark.sources.hdf import (
    HAS_H5PY,
    hdf_chunks_to_parquet,
    iter_hdf_chunks,
)


def _chunks(n_chunks=4, rows=250):
    for c in range(n_chunks):
        yield pd.DataFrame(
            {
                "id": range(c * rows, (c + 1) * rows),
                "x": [float(i % 17) for i in range(rows)],
                "label": [f"c{c}" for _ in range(rows)],
            }
        )


def test_chunks_roundtrip_rowcount(spark, tmp_path):
    target = str(tmp_path / "hdf_out")
    out = hdf_chunks_to_parquet(spark, _chunks(), target)
    assert out.count() == 1000
    assert set(out.columns) == {"id", "x", "label"}
    # all chunks present (append, not last-write-wins)
    labels = {r["label"] for r in out.select("label").distinct().collect()}
    assert labels == {"c0", "c1", "c2", "c3"}


def test_chunks_schema_drift_tolerated(spark, tmp_path):
    """A chunk missing a column contributes nulls (unionByName discipline
    via parquet schema merge)."""
    def drifting():
        yield pd.DataFrame({"id": [1, 2], "x": [1.0, 2.0]})
        yield pd.DataFrame({"id": [3, 4]})

    target = str(tmp_path / "hdf_drift")
    out = hdf_chunks_to_parquet(spark, drifting(), target)
    out = spark.read.option("mergeSchema", "true").parquet(target)
    assert out.count() == 4
    assert out.filter("x IS NULL").count() == 2


def test_partitioned_write(spark, tmp_path):
    target = str(tmp_path / "hdf_part")
    out = hdf_chunks_to_parquet(spark, _chunks(2), target, partition_by=["label"])
    assert out.count() == 500
    import os

    assert any(d.startswith("label=") for d in os.listdir(target))


def test_empty_iterator_raises(spark, tmp_path):
    with pytest.raises(ValueError):
        hdf_chunks_to_parquet(spark, iter(()), str(tmp_path / "none"))


def test_iter_hdf_chunks_gated():
    if not HAS_H5PY:
        with pytest.raises(NotImplementedError):
            next(iter_hdf_chunks("/nonexistent.h5", "ds"))

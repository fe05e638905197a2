"""HDF5 → Parquet batch conversion (the north star's named capability:
"DataFrame conversion from HDF to Parquet").

h5py/pytables are not in this container, so the HDF *decode* step is
gated behind an import-try; the Spark-side conversion pipeline — chunked
driver-side iteration → per-chunk Arrow DataFrames → unionByName →
partitioned parquet write — is real and tested via the fake in-memory
chunk iterator.

Scale design: HDF5 is a single-file, driver-readable format, so ingest
parallelism comes from CHUNKING, not splitting: read the dataset in
row-group-sized chunks, createDataFrame each (Arrow path), union — each
chunk becomes ≥1 partition, so the write fans out across the cluster
even though the read is sequential. For many HDF files, parallelize at
the file level instead (one task per file via spark.createDataFrame on
paths + mapInPandas doing the h5py read executor-side).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - exercised only where h5py exists
    import h5py  # type: ignore

    HAS_H5PY = True
except ImportError:
    h5py = None
    HAS_H5PY = False


def iter_hdf_chunks(
    path: str, dataset: str, chunk_rows: int = 1_000_000
) -> Iterator[pd.DataFrame]:
    """Yield pandas chunks of an HDF5 dataset. Requires h5py."""
    if not HAS_H5PY:
        raise NotImplementedError(
            "h5py is not installed in this environment; "
            "use hdf_chunks_to_parquet with a custom chunk iterator"
        )
    with h5py.File(path, "r") as f:  # pragma: no cover
        ds = f[dataset]
        n = ds.shape[0]
        for start in range(0, n, chunk_rows):
            block = ds[start : start + chunk_rows]
            yield pd.DataFrame(block)


def hdf_chunks_to_parquet(
    spark: SparkSession,
    chunks: Iterator[pd.DataFrame],
    target: str,
    partition_by: list[str] | None = None,
) -> DataFrame:
    """Convert a chunk iterator to a single partitioned Parquet dataset.

    Arrow-backed createDataFrame per chunk, written with per-chunk APPEND —
    an incremental-union plan would grow O(chunks) and bottleneck the
    driver; append keeps every chunk's plan a constant-size two-node write,
    and parquet appends are just new files in the target directory. The
    first chunk overwrites so reruns are idempotent.
    """
    wrote_any = False
    for pdf in chunks:
        part = spark.createDataFrame(pdf)
        writer = part.write.mode("append" if wrote_any else "overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(target)
        wrote_any = True
    if not wrote_any:
        raise ValueError("empty chunk iterator")
    # mergeSchema: under chunk schema drift the default read samples one
    # footer and can silently omit drifted columns; merging restores the
    # union-of-columns guarantee (column TYPES must stay consistent
    # across chunks — parquet cannot reconcile e.g. long vs string).
    return spark.read.option("mergeSchema", "true").parquet(target)


def hdf_to_parquet(
    spark: SparkSession,
    path: str,
    dataset: str,
    target: str,
    chunk_rows: int = 1_000_000,
) -> DataFrame:
    """End-to-end HDF5 → Parquet (requires h5py at runtime)."""
    return hdf_chunks_to_parquet(
        spark, iter_hdf_chunks(path, dataset, chunk_rows), target
    )

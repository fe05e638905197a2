"""FFD sequence packing invariants (suites/text.py:pipeline_pack_ffd)."""
from __future__ import annotations

import os

import pytest

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def packed(spark):
    if not os.path.isdir(SF):
        pytest.skip("fixture absent")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    return QUERIES["pipeline_pack_ffd"](spark, SF).collect()


def test_capacity_respected(packed):
    from collections import defaultdict

    fill = defaultdict(int)
    singleton = {}
    for r in packed:
        fill[(r.source, r.bin_id)] += r.n_tokens
        singleton.setdefault((r.source, r.bin_id), 0)
        singleton[(r.source, r.bin_id)] += 1
    for k, tot in fill.items():
        assert tot <= 256 or singleton[k] == 1, f"overfull shared bin {k}: {tot}"


def test_every_doc_assigned_once(spark, packed):
    ids = [r.doc_id for r in packed]
    n_docs = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert len(ids) == n_docs and len(set(ids)) == n_docs


def test_deterministic(spark, packed):
    from cirro_annotation_spark.registry import QUERIES

    again = QUERIES["pipeline_pack_ffd"](spark, SF).collect()
    assert sorted((r.doc_id, r.bin_id) for r in packed) == sorted(
        (r.doc_id, r.bin_id) for r in again
    )


def test_ffd_not_worse_than_sequential(spark, packed):
    """FFD must use <= the bins of naive sequential first-fit-in-id-order
    per source (it is the same algorithm on a better-sorted input)."""
    from collections import defaultdict

    from pyspark.sql import functions as F

    from cirro_annotation_spark.operators import text as X
    from cirro_annotation_spark.suites.util import t as T

    counted = (
        T(spark, SF, "documents")
        .select("doc_id", "source", X.token_count("text").cast("long").alias("n"))
        .collect()
    )
    by_source = defaultdict(list)
    for r in sorted(counted, key=lambda r: r.doc_id):
        by_source[r.source].append(r.n)
    seq_bins = {}
    for src, lens in by_source.items():
        rem = []
        for n in lens:
            for i in range(len(rem)):
                if n <= rem[i]:
                    rem[i] -= n
                    break
            else:
                rem.append(max(0, 256 - n))
        seq_bins[src] = len(rem)
    ffd_bins = defaultdict(set)
    for r in packed:
        ffd_bins[r.source].add(r.bin_id)
    for src in seq_bins:
        assert len(ffd_bins[src]) <= seq_bins[src]

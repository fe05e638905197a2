"""Cross-config determinism for the four rows-only queries (round 13).

The permanent rows-only floor (simhash xxhash64 interior, two
native-HLL interiors, streaming Bloom) has no DuckDB oracle by
necessity — their interiors are engine-private. Their value-level
gate is therefore determinism: the same query on differently
partitioned sessions of one JVM must produce identical values (the
full 350-query sweep runs via scripts/check_determinism.py; this
keeps the four oracle-less queries' slice in the default suite).

sf0.001 keeps this under ~2 min; the full-scale runs live in the
script sweeps (SCALE.md round-13 record: 350/350 at sf0.01 and
sf0.1 under all three configs).
"""
from __future__ import annotations

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.001"

ROWS_ONLY = [
    "dedup_simhash_pairs",
    "agg_approx_distinct",
    "agg_hll_mergeable",
    "stream_dedup_bloom",
]


def _cc():
    spec = importlib.util.spec_from_file_location(
        "cc_det", os.path.join(REPO, "scripts", "check_correctness.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_config_deterministic(spark, name):
    cc = _cc()
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    alt = spark.newSession()
    alt.conf.set("spark.sql.shuffle.partitions", "7")
    alt.conf.set("spark.sql.adaptive.enabled", "true")
    ref = cc._canon(QUERIES[name](spark, SF_DIR).toPandas())
    got = cc._canon(QUERIES[name](alt, SF_DIR).toPandas())
    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref)
    assert cc._hash(got) == cc._hash(ref)

"""Cross-config determinism for the four rows-only queries (round 13).

The permanent rows-only floor (simhash xxhash64 interior, two
native-HLL interiors, streaming Bloom) has no DuckDB oracle by
necessity — their interiors are engine-private. Their value-level
gate is therefore determinism: the same query on differently
partitioned sessions of one JVM must produce identical values (the
full 350-query sweep runs via scripts/check_determinism.py; this
keeps the four oracle-less queries' slice in the default suite).

sf0.001 keeps this under ~2 min; the full-scale runs live in the
script sweeps (see the SCALE.md round-13 determinism record).
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


def _load(script: str, name: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", script)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_query_is_config_deterministic(spark, name):
    cc = _load("check_correctness.py", "cc_det")
    cd = _load("check_determinism.py", "cd_det")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    # build_sessions sets the spark.cirro.tuneLayout sentinel so
    # tune_existing doesn't re-converge the configs at the first table
    # read (the round-13 vacuous-gate finding); the base session here
    # is a fresh newSession so the shared pytest session's confs are
    # not mutated.
    sess_a, sess_b, sess_c = cd.build_sessions(spark.newSession())
    ref = cc._canon(QUERIES[name](sess_a, SF_DIR).toPandas())
    for alt in (sess_b, sess_c):
        got = cc._canon(QUERIES[name](alt, SF_DIR).toPandas())
        assert list(got.columns) == list(ref.columns)
        assert len(got) == len(ref)
        assert cc._hash(got) == cc._hash(ref)

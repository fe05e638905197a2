"""Hypothesis property checks for the shared scale primitives —
operators/dedup.py global_rank / grouped_running_sum and
operators/suffixarray.py prefix_doubled_window_ranks.

These three carry most of the registry's "no single-reducer window"
rewrites (suffix-array rounds, IQR fences, sorted-neighborhood dedup),
so each is cross-checked here against a sequential model over generated
inputs, with the partition count itself randomized — the whole point of
the two-pass designs is that results must not depend on where the
range partitioner drops a boundary.
"""

from __future__ import annotations

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from cirro_annotation_spark.operators.dedup import global_rank, grouped_running_sum
from cirro_annotation_spark.operators.suffixarray import prefix_doubled_window_ranks


def test_global_rank_matches_sequential_sort(spark):
    """rank == 1-based index in the Python-sorted order, for any input
    and any partition count (boundary placement must not matter)."""

    @settings(max_examples=12, deadline=None)
    @given(
        vals=st.lists(
            st.integers(-1000, 1000), min_size=1, max_size=30, unique=True
        ),
        nparts=st.integers(1, 7),
    )
    def prop(vals, nparts):
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = {
            r["v"]: r["rnk"]
            for r in global_rank(df, ["v"], num_partitions=nparts).collect()
        }
        want = {v: i + 1 for i, v in enumerate(sorted(vals))}
        assert got == want, (vals, nparts, got)

    prop()


def test_global_rank_composite_key_with_tiebreaker(spark):
    """Duplicate leading keys are legal as long as the FULL order key is
    unique — ranks must follow the composite lexicographic order."""

    @settings(max_examples=10, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(st.integers(0, 3), st.integers(0, 1000)),
            min_size=1,
            max_size=25,
            unique_by=lambda t: t,
        ),
        nparts=st.integers(1, 6),
    )
    def prop(rows, nparts):
        df = spark.createDataFrame(rows, "a long, b long")
        got = {
            (r["a"], r["b"]): r["rnk"]
            for r in global_rank(df, ["a", "b"], num_partitions=nparts).collect()
        }
        want = {t: i + 1 for i, t in enumerate(sorted(rows))}
        assert got == want, (rows, nparts)

    prop()


def test_grouped_running_sum_matches_sequential(spark):
    """cum == per-group prefix sum in order, including NULL group keys
    (a real group — the ADVICE r14 null-safe join) and negative values,
    at any partition count."""

    @settings(max_examples=12, deadline=None)
    @given(
        rows=st.lists(
            st.tuples(
                st.one_of(st.none(), st.integers(0, 2)),  # group (None = NULL)
                st.integers(0, 100),  # order key
                st.integers(-50, 50),  # value
            ),
            min_size=1,
            max_size=30,
            unique_by=lambda t: (t[0], t[1]),  # (group, order) unique key
        ),
        nparts=st.integers(1, 7),
    )
    def prop(rows, nparts):
        df = spark.createDataFrame(rows, "g long, o long, v long")
        out = grouped_running_sum(
            df, ["g"], ["o"], "v", num_partitions=nparts
        ).collect()
        got = {(r["g"], r["o"]): r["cum"] for r in out}
        want = {}
        for g in {t[0] for t in rows}:
            acc = 0
            for _g, o, v in sorted(
                (t for t in rows if t[0] == g), key=lambda t: t[1]
            ):
                acc += v
                want[(g, o)] = acc
        assert got == want, (rows, nparts, got)

    prop()


def test_prefix_doubled_ranks_equal_iff_windows_equal(spark):
    """Two positions share a rank iff their depth-token sentinel-padded
    windows are identical token sequences — on random tiny-alphabet
    corpora (collisions guaranteed), every power-of-two depth, any
    partition count."""

    @settings(max_examples=8, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(["a", "b"]), min_size=1, max_size=12),
            min_size=1,
            max_size=3,
        ),
        depth=st.sampled_from([1, 2, 4]),
        nparts=st.integers(1, 5),
    )
    def prop(docs, depth, nparts):
        rows = [
            (d, p + 1, tok)
            for d, toks in enumerate(docs)
            for p, tok in enumerate(toks)
        ]
        tokens = spark.createDataFrame(rows, "doc_id long, pos long, tok string")
        out = prefix_doubled_window_ranks(tokens, depth, num_partitions=nparts)
        ranks = {(r["doc_id"], r["pos"]): r["r"] for r in out.collect()}

        # sequential model: the depth-token window with per-position
        # sentinel padding that can never equal a real token
        def window(d, p):  # p is 1-based
            toks = docs[d][p - 1 : p - 1 + depth]
            return tuple(toks) + ("\x00",) * (depth - len(toks))

        keys = list(ranks)
        assert set(keys) == {(d, p + 1) for d, t in enumerate(docs) for p in range(len(t))}
        for i in keys:
            for j in keys:
                same_rank = ranks[i] == ranks[j]
                same_window = window(*i) == window(*j)
                assert same_rank == same_window, (docs, depth, i, j)

    prop()

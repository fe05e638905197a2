"""Prefix-doubling suffix-array machinery (operators/suffixarray.py).

The scored query docs_dup_span_sa proves span parity against the
shingle formulation through the shared DuckDB oracle; these tests pin
the operator's interior on planted fixtures where the right answer is
known by construction: rank equality iff window equality, the
sentinel convention for overhanging windows, and the cross-document
duplicate test.
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cirro_annotation_spark.operators import suffixarray as SA


def _tokens(spark, docs):
    rows = []
    for doc_id, text in docs:
        toks = text.split(" ")
        for i, tok in enumerate(toks):
            rows.append((doc_id, len(toks), i + 1, tok))
    return spark.createDataFrame(
        rows, "doc_id long, n_tokens int, pos int, tok string"
    )


def test_window_ranks_equal_iff_windows_equal(spark):
    docs = [
        (1, "a b c d a b c d"),   # window (a b c d) repeats in-doc
        (2, "x a b c d y z w"),   # and across docs
        (3, "a b c e a b c e"),
    ]
    toks = _tokens(spark, docs).select("doc_id", "pos", "tok")
    got = SA.prefix_doubled_window_ranks(toks, 4).collect()
    ranks = {(r["doc_id"], r["pos"]): r["r"] for r in got}
    texts = {d: t.split(" ") for d, t in docs}

    def window(d, p):
        w = texts[d][p - 1 : p + 3]
        return tuple(w) + ("",) * (4 - len(w)) if len(w) == 4 else None

    keys = list(ranks)
    for ka in keys:
        for kb in keys:
            wa, wb = window(*ka), window(*kb)
            if wa is None or wb is None:
                continue  # overhanging windows: sentinel semantics
            assert (ranks[ka] == ranks[kb]) == (wa == wb), (ka, kb, wa, wb)


def test_overhang_never_collides_with_full_window(spark):
    # doc 1 ends with "a b"; doc 2 contains full "a b x y". The
    # overhanging depth-4 window at doc 1 pos 3 must NOT equal any
    # full window even though its real tokens prefix-match.
    docs = [(1, "q r a b"), (2, "a b x y z")]
    toks = _tokens(spark, docs).select("doc_id", "pos", "tok")
    got = {
        (r["doc_id"], r["pos"]): r["r"]
        for r in SA.prefix_doubled_window_ranks(toks, 4).collect()
    }
    assert got[(1, 3)] != got[(2, 1)]


def test_duplicated_window_positions_cross_doc_only(spark):
    # "m n o p" repeats inside doc 1 only -> NOT duplicated (the
    # ExactSubstr test here is count_distinct(doc_id) >= 2, matching
    # the scored oracle); "a b c d" spans docs 1 and 2 -> duplicated.
    docs = [
        (1, "m n o p m n o p a b c d"),
        (2, "z z a b c d z z"),
        (3, "u v w x y"),
    ]
    toks = _tokens(spark, docs)
    got = SA.duplicated_window_positions(toks, 4).collect()
    hits = {(r["doc_id"], r["pos"]) for r in got}
    assert hits == {(1, 9), (2, 3)}


def test_depth_must_be_power_of_two(spark):
    toks = _tokens(spark, [(1, "a b c")]).select("doc_id", "pos", "tok")
    with pytest.raises(ValueError):
        SA.prefix_doubled_window_ranks(toks, 6)

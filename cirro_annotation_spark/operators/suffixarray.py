"""Distributed suffix-array machinery by prefix doubling.

The exact-substring dedup of Lee et al. 2021 (arXiv:2107.06499,
"Deduplicating Training Data Makes Language Models Better") builds a
suffix array over the corpus to find duplicated spans. A monolithic
suffix array needs the whole corpus string in one address space; the
distributed construction is PREFIX DOUBLING (Manber-Myers, adapted to
MapReduce-style engines — e.g. Flick & Aluru, "Parallel distributed
memory construction of suffix and longest common prefix arrays"):
round k assigns every position a dense rank of the pair
(rank_k(i), rank_k(i + 2^k)), so after log2(L) rounds equal ranks mean
equal L-token windows — EXACT string equality, no hashing, without any
window's tokens ever being concatenated or shuffled as a string.

Cost shape at 100 TB: tokens shuffle ONCE (the vocabulary rank); every
subsequent round moves only (doc_id, pos, int, int) rows — three
integer shuffles for depth 8 regardless of how long the duplicated
spans are. Compare the shingle formulation (suites/text.py
docs_dup_span_coverage): it shuffles W-token STRINGS, which is fine at
W=8 but linearly worse as the span threshold grows; the rank path's
shuffle width is constant in W. Both compute the same duplicated-span
statistic — the suite pins that parity with a shared DuckDB oracle.

Reference anchor: the reference repo has no substring dedup (North-star
§2.12 extension); semantics follow the public ExactSubstr description.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cirro_annotation_spark.operators.dedup import global_rank


def prefix_doubled_window_ranks(
    tokens: DataFrame, depth: int, num_partitions: int = 32,
    dense_final: bool = True,
) -> DataFrame:
    """Dense integer ranks of every ``depth``-token window of the corpus.

    ``tokens`` has columns (doc_id, pos, tok) with ``pos`` 1-based and
    contiguous within each document. Returns (doc_id, pos, r) where two
    rows share ``r`` iff their ``depth``-token windows starting at
    ``pos`` are IDENTICAL token sequences (windows running past the end
    of a document are sentinel-padded: they only ever equal other
    windows with the same tokens AND the same overhang, so callers that
    filter ``pos <= n - depth + 1`` never see a padded collision).

    ``dense_final=False`` skips the LAST round's dense re-rank and
    returns (doc_id, pos, r, r2) instead: the PAIR (r, r2) equals
    between two rows iff their ``depth``-windows are identical (that is
    exactly the doubling invariant — rank_k(i) = rank_k(j) AND
    rank_k(i+k) = rank_k(j+k) iff the 2k-windows match), so callers
    that only group or join on window identity — the ExactSubstr
    duplicate test — save the final global_rank entirely: its range
    sampling pass, range shuffle, per-partition-size collect and the
    rank join-back (optimization r15, guide §2.4: remove shuffles
    outright; the dense single-column rank was paid for and thrown
    away).

    If ``tokens`` additionally carries a ``tok2`` column (the NEXT
    token at ``pos + 1``, NULL when the suffix ends — callers that hold
    the token ARRAY produce it scan-locally for free) and ``depth >= 2``,
    the vocabulary round and the first doubling round FUSE: rank_2 is
    the dense rank of the distinct (tok, next) pairs directly, saving
    one full global_rank round (range sample pass + range exchange +
    offsets collect) plus one integer self-join over the position table
    (optimization r16, VERDICT r15 item 5; guide §2.4). The rank VALUES
    are identical to the unfused path's rank_2: ordering pairs by
    (tok, has-next, next-token) is the same total order as
    (vocab-rank, sentinel-0-or-vocab-rank), so every later round — and
    any dense_final consumer — sees byte-identical ranks.

    ``depth`` must be a power of two (the doubling invariant).
    """
    if depth < 1 or depth & (depth - 1):
        raise ValueError(f"depth must be a power of two, got {depth}")
    if depth >= 2 and "tok2" in tokens.columns:
        # Fused round 0+1: dense rank of (tok, tok2) — still the only
        # string shuffle. has-next sorts a suffix-final window before
        # every real continuation (the sentinel-0 convention), and the
        # empty-string stand-in for NULL cannot collide with a genuine
        # empty token because h2 disambiguates.
        keyed = tokens.select(
            "doc_id",
            "pos",
            "tok",
            F.col("tok2").isNotNull().cast("int").alias("h2"),
            F.coalesce("tok2", F.lit("")).alias("t2"),
        )
        vocab2 = global_rank(
            keyed.select("tok", "h2", "t2").distinct(),
            ["tok", "h2", "t2"],
            num_partitions,
        ).select("tok", "h2", "t2", F.col("rnk").alias("r"))
        cur = (
            keyed.join(vocab2, ["tok", "h2", "t2"])
            .select("doc_id", "pos", "r")
            .localCheckpoint(eager=True)
        )
        k = 2
        if k >= depth:
            return cur
    else:
        # Round 0: dense vocabulary rank — the ONLY string shuffle.
        vocab = global_rank(
            tokens.select("tok").distinct(), ["tok"], num_partitions
        ).select("tok", F.col("rnk").alias("r"))
        cur = (
            tokens.join(vocab, "tok")
            .select("doc_id", "pos", "r")
            .localCheckpoint(eager=True)  # also breaks the self-join lineage
        )
        k = 1
    while k < depth:
        # rank_{2k}(i) = dense rank of (rank_k(i), rank_k(i + k));
        # missing right half (suffix shorter than 2k) -> sentinel 0,
        # below every real rank (global_rank is 1-based).
        shifted = cur.select(
            "doc_id",
            (F.col("pos") - k).alias("pos"),
            F.col("r").alias("r2"),
        )
        pairs = (
            cur.join(shifted, ["doc_id", "pos"], "left")
            .select(
                "doc_id",
                "pos",
                "r",
                F.coalesce("r2", F.lit(0)).cast("long").alias("r2"),
            )
        )
        if not dense_final and k * 2 >= depth:
            # Eager checkpoint mirrors the dense path's round-final
            # materialization: downstream consumers (the duplicate test
            # reads this frame twice) reuse the persisted integer rows.
            return pairs.localCheckpoint(eager=True)
        ranked = global_rank(
            pairs.select("r", "r2").distinct(), ["r", "r2"], num_partitions
        ).select("r", "r2", F.col("rnk").alias("__nr"))
        cur = (
            pairs.join(ranked, ["r", "r2"])
            .select("doc_id", "pos", F.col("__nr").alias("r"))
            .localCheckpoint(eager=True)  # O(1) plan depth per round
        )
        k *= 2
    return cur


def duplicated_window_positions(
    tokens_with_len: DataFrame, depth: int, num_partitions: int = 32
) -> DataFrame:
    """Positions whose ``depth``-token window also occurs in ANOTHER
    document — the ExactSubstr duplicate test, exactly (rank equality
    is string equality; no hash collisions by construction).

    ``tokens_with_len`` has (doc_id, pos, tok, n_tokens). Returns
    (doc_id, pos) for every in-range duplicated window start.
    """
    cols = ["doc_id", "pos", "tok"] + (
        ["tok2"] if "tok2" in tokens_with_len.columns else []
    )
    ranks = prefix_doubled_window_ranks(
        tokens_with_len.select(*cols), depth, num_partitions,
        dense_final=False,
    )
    # depth == 1 yields the single-column vocab rank; otherwise the
    # final (r, r2) pair IS window identity (see dense_final docs).
    keys = [c for c in ("r", "r2") if c in ranks.columns]
    lens = tokens_with_len.select("doc_id", "n_tokens").distinct()
    in_range = ranks.join(lens, "doc_id").filter(
        F.col("pos") <= F.col("n_tokens") - (depth - 1)
    )
    dup = (
        in_range.groupBy(*keys)
        .agg(F.count_distinct("doc_id").alias("__nd"))
        .filter(F.col("__nd") >= 2)
        .select(*keys)
    )
    return in_range.join(dup, keys).select("doc_id", "pos")

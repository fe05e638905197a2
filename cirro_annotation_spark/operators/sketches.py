"""Frequency-sketch operators: guaranteed-superset heavy hitters.

Reference parity note: the reference (CirroBio/Cirro-Annotation) has no
sketch operators; this belongs to the large-scale-pipeline extension
surface (hot-key detection for skew handling, abuse/rate monitoring).
The algorithm is the public Misra-Gries summary (Misra & Gries 1982)
with the weighted merge of Agarwal et al. 2013 ("Mergeable summaries").

Two-phase exact heavy hitters, the shape a 100 TB stream needs:

Phase 1 (map-side, no shuffle): each partition folds its rows into an
M-counter Misra-Gries summary via Arrow-batched ``mapInPandas`` and
emits only its counter KEYS — ≤ M rows per partition regardless of
input size. Pigeonhole guarantee: any value with GLOBAL count
> n/(M+1) exceeds the local threshold in at least one partition, so
the union of partition summaries is a guaranteed superset of the true
heavy hitters (no false negatives — false positives are fine, phase 2
removes them).

Phase 2 (one bounded shuffle): exact recount of candidate values only
— the big table semi-joins the ≤ M×partitions candidate set
(broadcast), then one partial-combined groupBy. The final filter
``cnt * (M+1) > n`` is integer arithmetic, so the result is EXACT and
independent of partitioning, batch boundaries, or which extra
candidates phase 1 happened to emit. That independence is what makes
the operator oracle-checkable against a plain GROUP BY ... HAVING.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, col: str, m: int) -> DataFrame:
    """Per-partition M-counter Misra-Gries summaries; returns the union
    of summary keys (column name preserved) — a guaranteed superset of
    every value with global frequency > n/(m+1)."""

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters: pd.Series | None = None
        for pdf in batches:
            vc = pdf[col].value_counts()
            counters = vc if counters is None else counters.add(vc, fill_value=0)
            if len(counters) > m:
                # weighted MG reduction: subtract the (m+1)-th largest
                # count from everything, keep strictly-positive counters
                # (Agarwal et al. 2013 — preserves the error bound and
                # therefore the superset guarantee).
                kth = counters.nlargest(m + 1).iloc[-1]
                counters = counters - kth
                counters = counters[counters > 0]
        if counters is not None and len(counters):
            yield counters.index.to_frame(index=False, name=col)

    return df.select(col).mapInPandas(summarize, schema=df.select(col).schema)


def heavy_hitters_exact(df: DataFrame, col: str, m: int) -> DataFrame:
    """All values of ``col`` with count > n/(m+1), with exact counts.

    Output: (col, cnt) — exact, partitioning-independent.
    """
    candidates = misra_gries_candidates(df, col, m).distinct()
    n_total = df.groupBy().agg(F.count("*").alias("n_total"))
    return (
        df.join(F.broadcast(candidates), col, "left_semi")
        .groupBy(col)
        .agg(F.count("*").alias("cnt"))
        .crossJoin(F.broadcast(n_total))
        .filter(F.col("cnt") * (m + 1) > F.col("n_total"))
        .select(col, "cnt")
    )


def hll_md5_register_cells(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Engine-neutral HLL register maintenance over ``key_col`` — the
    sketch STATE, exact and mergeable, shared by the batch query and
    its streaming twin (the merge operator is max, so the same
    aggregation is valid per micro-batch in complete mode).

    bucket = first 12 md5 bits (m=4096); rho = leading-zero count of
    the next 52 bits + 1, via the bin()-length identity probed equal
    Spark-vs-DuckDB. r_even/r_odd are the half-corpus registers whose
    per-bucket max must equal r_all — the mergeability contract as a
    hash-checked column. One map-side-combined aggregate; keys never
    shuffle raw (bucket + rho travel)."""
    hexs = F.md5(F.col(key_col).cast("string"))
    bucket = F.conv(F.substring(hexs, 1, 3), 16, 10).cast("long")
    rest = F.conv(F.substring(hexs, 4, 13), 16, 10).cast("long")
    rho = (
        F.when(rest > 0, 53 - F.length(F.bin(rest)))
        .otherwise(F.lit(53))
        .cast("long")
    )
    r = df.select(
        F.col(key_col), bucket.alias("bucket"), rho.alias("rho")
    )
    # pmod, not %: Spark's % keeps the dividend's sign, so a negative
    # odd key (-3 % 2 = -1) would fall in NEITHER half and falsify
    # merged_eq on correct data (code-review r15). The oracle twin uses
    # ((k % 2) + 2) % 2 — the same non-negative parity.
    even = F.max(F.when(F.pmod(F.col(key_col), F.lit(2)) == 0, F.col("rho")))
    odd = F.max(F.when(F.pmod(F.col(key_col), F.lit(2)) == 1, F.col("rho")))
    return r.groupBy("bucket").agg(
        F.max("rho").alias("r_all"),
        even.alias("r_even"),
        odd.alias("r_odd"),
        (
            F.greatest(
                F.coalesce(even, F.lit(0)), F.coalesce(odd, F.lit(0))
            )
            == F.max("rho")
        ).alias("merged_eq"),
    )


def bitmap_word_cells(df: DataFrame, key_col: str = "user_id") -> DataFrame:
    """EXACT distinct-count bitmap cells over a non-negative integer key
    — the roaring-bitmap shape on open primitives: word_id = key div 32,
    one set bit per present key, OR as the merge operator. Unlike the
    HLL/KMV sketches this is exact at any size; the cost is state
    proportional to the key domain / 32 (the roaring trade). wd_even /
    wd_odd are the half-corpus words whose OR must reproduce wd — the
    mergeability contract as data (the HLL merged-register pattern).
    One map-side-combined aggregate; keys never shuffle raw (word + bit
    travel). OR is the merge operator, so the same aggregation is valid
    per micro-batch in complete mode (the streaming twin)."""
    k = F.col(key_col)
    # F.shiftleft takes a literal shift count; the column-valued shift
    # needs the SQL form.
    bit = F.expr(f"shiftleft(1L, CAST({key_col} % 32 AS INT))")
    return (
        df.select(
            F.expr(f"{key_col} div 32").cast("long").alias("word_id"),
            bit.alias("b"),
            (k % 2 == 0).alias("is_even"),
        )
        .groupBy("word_id")
        .agg(
            F.expr("bit_or(b)").cast("long").alias("wd"),
            F.expr("bit_or(CASE WHEN is_even THEN b ELSE 0L END)")
            .cast("long")
            .alias("wd_even"),
            F.expr("bit_or(CASE WHEN NOT is_even THEN b ELSE 0L END)")
            .cast("long")
            .alias("wd_odd"),
        )
    )

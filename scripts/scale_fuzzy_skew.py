"""Adversarial skewed-length tier for dedup_fuzzy_blocked (VERDICT r6
item 3's done-condition): a corpus where (nearly) EVERY document falls
in one ±2-char length band — the real-corpus shape that makes a
length-only blocking key quadratic — but first tokens are diverse.

Build: N docs (default 50_000 = 10× the sf0.1 corpus), all with
n_chars in [95, 97] (one ±2-char band; home blocks floor(n/3) span
31/32, covered by the operator's ±1 block probing), first
token drawn from 30 values (the sf0.1 corpus's measured tok0
cardinality). Deterministic content via md5 of the doc id — no RNG.

Measured quantities (exact counts, not estimates):
- length-only candidates: pairs with |Δn_chars| ≤ 2  → ~N²/2 here,
  the quadratic blow-up the round-6 verdict flagged;
- composite candidates: pairs that ALSO share tok0 → bounded by
  Σ_t C(n_t, 2), a 30× reduction at uniform token frequency and the
  levenshtein kernel's actual input under the round-7 key.

The script asserts the reduction ratio ≥ 10× and prints both counts
plus the end-to-end wall time of the composite-blocked join. Counting
uses the same plan shape as the operator (explode 3 length blocks,
equi-join on the composite key) so the measured number is the real
shuffle+join cost, not a simulation.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000

    from cirro_annotation_spark.session import get_spark

    spark = get_spark("scale-fuzzy-skew")

    # Deterministic skewed corpus: every doc 95-97 chars (5-char token
    # + space + 60-char rpad md5 + space + 28-30 char suffix), 30 tokens.
    toks = F.array(*[F.lit(f"tok{i:02d}") for i in range(30)])
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.element_at(toks, (F.col("id") % 30 + 1).cast("int")),
            F.rpad(F.md5(F.col("id").cast("string")), 60, "x"),
            F.substring(F.md5(F.concat(F.lit("s"), F.col("id").cast("string"))),
                        1, (F.col("id") % 3 + 28).cast("int")),
        ).alias("text"),
    ).withColumn("n_chars", F.length("text")).localCheckpoint(eager=True)
    bands = docs.select(F.col("n_chars")).distinct().count()
    print(f"{n} docs, {bands} distinct lengths (all one ±2 band)")

    tok0 = F.element_at(F.split(F.trim(F.col("text")), r"\s+"), 1)
    d = docs.select(
        "doc_id", "n_chars",
        F.substring("text", 1, 40).alias("prefix"), tok0.alias("tok0"),
    )
    blk3 = F.explode(
        F.array(
            F.floor(F.col("n_chars") / 3) - 1,
            F.floor(F.col("n_chars") / 3),
            F.floor(F.col("n_chars") / 3) + 1,
        )
    ).alias("blk")
    blocked = d.select("doc_id", "n_chars", "prefix", "tok0", blk3)
    home = d.withColumn("blk", F.floor(F.col("n_chars") / 3))
    a, b = blocked.alias("a"), home.alias("b")

    length_pred = (
        (F.col("a.blk") == F.col("b.blk"))
        & (F.col("a.doc_id") < F.col("b.doc_id"))
        & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 2)
    )
    t0 = time.perf_counter()
    n_len_only = (
        a.join(b, length_pred)
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    t_len = time.perf_counter() - t0
    t0 = time.perf_counter()
    n_composite = (
        a.join(b, (F.col("a.tok0") == F.col("b.tok0")) & length_pred)
        .select("a.doc_id", "b.doc_id").distinct().count()
    )
    t_comp = time.perf_counter() - t0
    ratio = n_len_only / max(n_composite, 1)
    print(f"length-only candidates: {n_len_only}  ({t_len:.1f} s)")
    print(f"composite candidates:   {n_composite}  ({t_comp:.1f} s)  "
          f"reduction {ratio:.1f}x")
    assert ratio >= 10, "composite key failed to bound the skewed band"
    print("SKEW TIER CHECK PASSED")

    er_capstone_phase(spark, n)
    return 0


def er_capstone_phase(spark, n: int) -> None:
    """VERDICT r7 item 8: the fuzzy kernel's skew tier (above) stresses
    the LENGTH band; the ER capstone shares the composite key but its
    own adversarial axis is TOKEN skew — a real corpus where one first
    token ("the") dominates. Build N docs with 60% sharing one tok0
    across a realistic length spread (81-160 chars, ~27 bands), count
    the candidate pairs the composite key actually admits, bound them
    by Σ_block C(occ,2)-shaped arithmetic, and run the FULL capstone
    (block → levenshtein → closure → golden records) end-to-end.

    The documented bound: candidates ≤ Σ_(tok0, home band) probe_occ ×
    home_occ. With the dominant token spread over B bands, its
    contribution is ~3·(0.6N/B)²·B = 2.7·(0.6N)²/B — the band axis is
    what keeps a dominant token affordable, exactly symmetric to how
    tok0 kept the single-band corpus affordable in the phase above."""
    import shutil
    import tempfile

    from cirro_annotation_spark.suites.dedup import (
        pipeline_entity_resolution,
    )

    out = os.path.join(tempfile.gettempdir(), "scale_er_skew")
    shutil.rmtree(out, ignore_errors=True)
    toks = F.array(*[F.lit(f"w{i:02d}") for i in range(30)])
    dominant = F.col("id") % 10 < 6  # 60% share one first token
    tok = F.when(dominant, F.lit("the")).otherwise(
        F.element_at(toks, (F.col("id") % 30 + 1).cast("int"))
    )
    body_len = (F.col("id") % 80 + 75).cast("int")  # 81-160 chars total
    text = F.concat_ws(
        " ",
        tok,
        F.rpad(F.md5(F.col("id").cast("string")), body_len, "y"),
    )
    (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.length(text).alias("n_chars"),
        )
        .coalesce(4)
        .write.mode("overwrite")
        .parquet(os.path.join(out, "documents.parquet"))
    )

    docs = spark.read.parquet(os.path.join(out, "documents.parquet"))
    tok0 = F.element_at(F.split(F.trim(F.col("text")), r"\s+"), 1)
    d = docs.select(
        "doc_id", "n_chars", tok0.alias("tok0"),
        F.floor(F.col("n_chars") / 3).alias("blk"),
    )
    occ = d.groupBy("tok0", "blk").count()
    stats = occ.agg(
        F.max("count").alias("max_occ"), F.count("*").alias("n_blocks")
    ).first()
    brute = n * (n - 1) // 2
    # Candidates as the operator joins them: probe explodes 3 blocks,
    # home keeps its own; same-key pair volume before the edit filter.
    a = d.select(
        "doc_id", "tok0", "n_chars",
        F.explode(F.array(F.col("blk") - 1, F.col("blk"), F.col("blk") + 1))
        .alias("blk"),
    ).alias("a")
    b = d.alias("b")
    t0 = time.perf_counter()
    n_cand = (
        a.join(
            b,
            (F.col("a.tok0") == F.col("b.tok0"))
            & (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))
            & (F.abs(F.col("a.n_chars") - F.col("b.n_chars")) <= 2),
        )
        .select("a.doc_id", "b.doc_id")
        .distinct()
        .count()
    )
    t_cand = time.perf_counter() - t0
    print(
        f"ER token-skew: {n} docs, dominant tok0 covers 60%, "
        f"{stats['n_blocks']} composite blocks, max occupancy "
        f"{stats['max_occ']}"
    )
    print(
        f"capstone candidates {n_cand:,} vs brute {brute:,} "
        f"({brute / max(n_cand, 1):.0f}x reduction, counted in {t_cand:.1f} s)"
    )
    assert brute / max(n_cand, 1) >= 10, "token skew broke the bound"

    t0 = time.perf_counter()
    n_entities = pipeline_entity_resolution(spark, out).count()
    wall = time.perf_counter() - t0
    print(f"full ER capstone on token-skewed corpus: {n_entities} entities "
          f"in {wall:.1f} s")
    print("ER TOKEN-SKEW PHASE PASSED")


if __name__ == "__main__":
    sys.exit(main())

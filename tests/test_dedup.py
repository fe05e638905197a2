"""Property tests for the dedup operators (SURVEY.md §2.12).

The round-1 MinHash bug (all signature slots identical — a silent
degenerate family) is exactly what these tests exist to catch.
"""
from __future__ import annotations

from pyspark.sql import functions as F

from cirro_annotation_spark.operators.dedup import (
    dedup_exact,
    dedup_near_minhash,
    jaccard_verify,
    minhash_candidates,
    minhash_signature,
    shingles,
    simhash64,
    simhash_near_pairs,
)

DOC = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to hide from the loud hunters"
)
NEAR_DOC = DOC.replace("green", "dark")  # one token differs → high jaccard
FAR_DOC = (
    "completely unrelated text about databases query engines and the "
    "cost based optimization of distributed analytical workloads at scale"
)


def _docs(spark):
    rows = [(0, DOC), (1, NEAR_DOC), (2, FAR_DOC)]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_signature_not_degenerate(spark):
    """A 32-hash signature must use 32 DISTINCT hash functions: on a
    many-shingle doc the slots should be (nearly) all distinct."""
    df = _docs(spark)
    sig = df.filter("doc_id = 0").select(
        minhash_signature(shingles("text"), 32).alias("sig")
    ).first()["sig"]
    assert len(sig) == 32
    assert len(set(sig)) > 16, f"degenerate signature: {len(set(sig))} distinct"


def test_minhash_signature_similarity_ordering(spark):
    """Near-identical docs agree on most signature slots; unrelated docs
    agree on (almost) none."""
    sigs = {
        r["doc_id"]: r["sig"]
        for r in _docs(spark)
        .select("doc_id", minhash_signature(shingles("text"), 64).alias("sig"))
        .collect()
    }
    agree_near = sum(a == b for a, b in zip(sigs[0], sigs[1]))
    agree_far = sum(a == b for a, b in zip(sigs[0], sigs[2]))
    assert agree_near > 32, f"near-dup agreement too low: {agree_near}/64"
    assert agree_far <= 8, f"unrelated docs agree on {agree_far}/64 slots"


def test_lsh_recall_on_planted_duplicates(spark):
    """Plant 20 near-duplicate pairs in 100 distinct docs; banded LSH +
    jaccard verify must recover >= 90% of them."""
    rows = []
    for i in range(100):
        base = " ".join(f"tok{i}_{j} word{(i * 7 + j) % 23}" for j in range(30))
        rows.append((i * 2, base))
        if i < 20:  # first 20 docs get a near-dup twin (one token changed)
            rows.append((i * 2 + 1, base.replace(f"tok{i}_5", "CHANGED")))
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cands = minhash_candidates(df, "text", "doc_id", num_hashes=32, bands=8)
    verified = jaccard_verify(df, cands, "text", "doc_id", threshold=0.7)
    found = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    planted = {(i * 2, i * 2 + 1) for i in range(20)}
    recall = len(found & planted) / len(planted)
    assert recall >= 0.9, f"LSH recall {recall} < 0.9 (found {len(found & planted)}/20)"


def test_dedup_near_minhash_drops_only_duplicates(spark):
    df = _docs(spark)
    kept = dedup_near_minhash(df, "text", "doc_id", threshold=0.6)
    ids = sorted(r["doc_id"] for r in kept.collect())
    assert ids == [0, 2], f"expected near-dup 1 dropped, got {ids}"


def test_dedup_exact_first_wins(spark):
    rows = [(3, "same text"), (1, "same text"), (2, "OTHER")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    kept = sorted(r["doc_id"] for r in dedup_exact(df, "text", "doc_id").collect())
    assert kept == [1, 2]


def test_simhash_near_pairs(spark):
    """The 4×16-bit pigeonhole bucketing guarantees recall for pairs
    within Hamming ≤ 3 *in buckets under the bucket_cap* (default 4096;
    oversized buckets are sub-banded on the next chunk, the standard
    prefix-extension recall trade — pass bucket_cap=None for the
    unconditional pigeonhole). A one-token change in a 120-token doc
    lands there (measured Hamming = 1). Unrelated docs must not
    collide."""
    long_doc = " ".join(f"stable{i} anchor{i} fixed{i}" for i in range(40))
    near = long_doc.replace("anchor0", "CHG0")
    rows = [(0, long_doc), (1, near), (2, FAR_DOC)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = simhash_near_pairs(df, "text", "doc_id", max_hamming=3)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (0, 1) in got
    assert (0, 2) not in got


def test_simhash_deterministic(spark):
    df = _docs(spark)
    a = df.select(simhash64("text").alias("s")).collect()
    b = df.select(simhash64("text").alias("s")).collect()
    assert a == b


def test_minhash_verify_golden_pairs_nonvacuous(spark):
    """dedup_minhash_verify's pinned golden candidates belong to the
    sf0.01 fixture; at that sf the query MUST emit all 25 verified pairs
    (a 0-row GREEN at another sf is an agreed-empty result, not a check
    — this pins the non-vacuous case the gate actually runs at)."""
    import os

    if not os.path.exists("/root/testdata/sf0.01/documents.parquet"):
        import pytest

        pytest.skip("sf0.01 fixture not present")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    out = QUERIES["dedup_minhash_verify"](spark, "/root/testdata/sf0.01")
    rows = out.collect()
    assert len(rows) == 25
    assert all(r["jaccard"] >= 0.5 for r in rows)


def _cc(spark, pairs):
    from cirro_annotation_spark.operators.dedup import connected_components

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components(edges)
    return {r["vertex"]: r["component"] for r in out.collect()}


def test_cc_path_graph_single_component(spark):
    """A 6-vertex path needs transitive closure across every hop — the
    shape plain pairwise verify can't collapse and slow propagation
    would get wrong if it stopped early."""
    labels = _cc(spark, [(i, i + 1) for i in range(5)])
    assert labels == {i: 0 for i in range(6)}


def test_cc_disjoint_components(spark):
    labels = _cc(spark, [(1, 2), (10, 11), (11, 12), (20, 21)])
    assert labels == {1: 1, 2: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_cc_triangle_plus_bridge(spark):
    # triangle {3,4,5} bridged to {1} through 2 → one component rooted at 1
    labels = _cc(spark, [(3, 4), (4, 5), (3, 5), (2, 3), (1, 2)])
    assert labels == {v: 1 for v in (1, 2, 3, 4, 5)}


def test_cc_direction_invariant(spark):
    """Edges are undirected: reversing every pair must not change the
    components (the symmetrize step is what guarantees this)."""
    pairs = [(5, 1), (2, 5), (9, 7)]
    fwd = _cc(spark, pairs)
    rev = _cc(spark, [(b, a) for a, b in pairs])
    assert fwd == rev == {1: 1, 2: 1, 5: 1, 7: 7, 9: 7}


def _cc_star(spark, pairs):
    from cirro_annotation_spark.operators.dedup import connected_components_star

    edges = spark.createDataFrame(pairs, "id_a long, id_b long")
    out = connected_components_star(edges)
    return {r["vertex"]: r["component"] for r in out.collect()}


def test_cc_star_agrees_with_propagation_on_known_graphs(spark):
    """Star rewiring must produce identical components to min-label
    propagation on every shape the propagation tests pin."""
    for pairs in (
        [(i, i + 1) for i in range(5)],
        [(1, 2), (10, 11), (11, 12), (20, 21)],
        [(3, 4), (4, 5), (3, 5), (2, 3), (1, 2)],
        [(5, 1), (2, 5), (9, 7)],
    ):
        assert _cc_star(spark, pairs) == _cc(spark, pairs), pairs


def test_cc_star_long_path_few_rounds(spark):
    """The reason this variant exists: a 64-link chain converges in
    O(log^2) star rounds where propagation needs 64. Known answer:
    everything reaches root 0."""
    labels = _cc_star(spark, [(i, i + 1) for i in range(64)])
    assert labels == {i: 0 for i in range(65)}


def test_cc_star_random_graphs_match_propagation(spark):
    """Seeded random sparse graphs: both algorithms must agree exactly
    (they compute the same mathematical object by different routes)."""
    import random

    rng = random.Random(7)
    for trial in range(3):
        n = 60
        pairs = [
            (rng.randrange(n), rng.randrange(n)) for _ in range(45)
        ]
        pairs = [(a, b) for a, b in pairs if a != b]
        assert _cc_star(spark, pairs) == _cc(spark, pairs), trial

def test_cc_propagation_raises_on_round_cap(spark):
    """Round-5 advisor: exhausting max_iter must raise, not hand back
    plausible-but-unconverged labels. A 20-link path cannot finish
    min-label propagation in 3 rounds."""
    import pytest

    from cirro_annotation_spark.operators.dedup import (
        ComponentsNotConverged,
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "id_a long, id_b long"
    )
    with pytest.raises(ComponentsNotConverged):
        connected_components(edges, max_iter=3)


def test_cc_star_raises_on_round_cap(spark):
    import pytest

    from cirro_annotation_spark.operators.dedup import (
        ComponentsNotConverged,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    with pytest.raises(ComponentsNotConverged):
        connected_components_star(edges, max_iter=1)


def test_cc_auto_falls_through_to_star_on_long_path(spark):
    """Round-5 verdict item 5: a path graph whose diameter exceeds the
    propagation round cap must transparently complete via star rewiring
    with the identical (vertex, component) answer."""
    from cirro_annotation_spark.operators.dedup import connected_components_auto

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(40)], "id_a long, id_b long"
    )
    out = connected_components_auto(edges, propagation_rounds=4)
    labels = {r["vertex"]: r["component"] for r in out.collect()}
    assert labels == {i: 0 for i in range(41)}


def test_cc_auto_uses_propagation_on_small_diameter(spark):
    """On the common near-clique dedup graph the capped propagation
    already converges — same answer, no fallback needed."""
    from cirro_annotation_spark.operators.dedup import connected_components_auto

    edges = spark.createDataFrame(
        [(3, 4), (4, 5), (3, 5), (2, 3), (1, 2)], "id_a long, id_b long"
    )
    out = connected_components_auto(edges, propagation_rounds=8)
    labels = {r["vertex"]: r["component"] for r in out.collect()}
    assert labels == {v: 1 for v in (1, 2, 3, 4, 5)}


def test_bloom_route_planted_duplicates(spark):
    """Planted-dup frames: the bloom route must (a) drop every true
    duplicate (no false negatives — guaranteed, not probabilistic),
    (b) accept every genuinely-new doc (false positives are caught by
    the exact verify), so the result equals the plain anti-join."""
    from cirro_annotation_spark.suites.dedup import bloom_route_new_docs

    corpus_rows = [(f"corpus text number {i} alpha beta",) for i in range(200)]
    corpus = spark.createDataFrame(corpus_rows, "f string")
    # batch: 50 dups of corpus docs + 50 new docs
    batch_rows = [(1000 + i, f"corpus text number {i} alpha beta") for i in range(50)]
    batch_rows += [(2000 + i, f"fresh text number {i} gamma delta") for i in range(50)]
    batch = spark.createDataFrame(batch_rows, "doc_id long, f string")

    got = set(r.doc_id for r in bloom_route_new_docs(corpus, batch).collect())
    assert got == {2000 + i for i in range(50)}


def test_bloom_routing_prunes_and_bitmap_bounded(spark):
    """The candidate set reaching the exact join must be tiny (the
    bloom routes ~all new docs around it at fixture fpp), and the
    bitmap is bounded by m/64 words regardless of corpus size."""
    from cirro_annotation_spark.suites.dedup import (
        BLOOM_K,
        BLOOM_M,
        bloom_build_bitmap,
        bloom_might_contain,
        _bloom_positions,
    )

    corpus = spark.createDataFrame(
        [(f"corpus text number {i} alpha beta",) for i in range(500)], "f string"
    )
    bitmap = bloom_build_bitmap(corpus)
    assert len(bitmap) == BLOOM_M >> 6
    # set-bit count <= corpus * k (and > 0)
    nbits = sum(bin(v & ((1 << 64) - 1)).count("1") for v in bitmap)
    assert 0 < nbits <= 500 * BLOOM_K

    batch = spark.createDataFrame(
        [(i, f"fresh text number {i} gamma delta") for i in range(1000)],
        "doc_id long, f string",
    )
    bm, pred = bloom_might_contain(bitmap)
    probe = batch
    for i, pos in enumerate(_bloom_positions()):
        probe = probe.withColumn(f"__bloom_p{i}", pos)
    n_candidates = (
        probe.withColumn("__bloom_bm", bm).filter(pred).count()
    )
    # fpp ~ (500*3/131072)^3 ~ 1.5e-6 — essentially nothing may leak
    assert n_candidates <= 2, f"bloom fpp too high: {n_candidates}/1000"


def test_bloom_prefilter_matches_exact_on_fixture(spark):
    """Fixture-level agreement with the plain anti-join (the oracle
    path), through the registered query's own split."""
    import os

    sf_dir = "/root/testdata/sf0.01"
    if not os.path.isdir(sf_dir):
        import pytest

        pytest.skip("sf0.01 fixture not present")
    from cirro_annotation_spark.suites.dedup import bloom_prefilter_new_docs
    from cirro_annotation_spark.suites.util import t

    d = t(spark, sf_dir, "documents")
    f = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    fp = d.select("doc_id", f.alias("f"))
    cutoff = fp.agg((F.max("doc_id") * 4 / 5).cast("long")).collect()[0][0]
    corpus = fp.filter(F.col("doc_id") <= cutoff).select("f")
    batch = fp.filter(F.col("doc_id") > cutoff).select("doc_id", "f")

    exact_new = set(
        r.doc_id for r in batch.join(corpus, "f", "left_anti").collect()
    )
    bloom_new = set(r.doc_id for r in bloom_prefilter_new_docs(spark, sf_dir).collect())
    assert bloom_new == exact_new


# ---------------------------------------------------------------------------
# jaccard_prefix_join


def _prefix_pairs(spark, docs, tau=(9, 10)):
    from cirro_annotation_spark.operators.dedup import jaccard_prefix_join

    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = jaccard_prefix_join(df, "text", "doc_id", *tau).collect()
    return {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}


def test_prefix_join_finds_identical_and_boundary_pair(spark):
    # x: 10 tokens, y: 9 of them -> J = 9/10 = tau exactly (>= keeps it);
    # z: 8 of them -> J = 8/10, below tau.
    base = [f"w{i}" for i in range(10)]
    docs = [
        (1, " ".join(base)),
        (2, " ".join(base[:9])),
        (3, " ".join(base[:8])),
        (4, " ".join(base)),  # identical to 1
    ]
    got = _prefix_pairs(spark, docs)
    assert got[(1, 4)] == 1.0
    assert got[(1, 2)] == 0.9
    assert (1, 3) not in got and (2, 3) not in got  # 8/10 and 8/9 < 0.9... 8/9 < 0.9? 0.888 yes
    assert got[(2, 4)] == 0.9


def test_prefix_join_single_token_docs(spark):
    # n=1 -> prefix length 1; identical single-token docs must pair.
    got = _prefix_pairs(spark, [(1, "only"), (2, "only"), (3, "other")])
    assert got == {(1, 2): 1.0}


def test_prefix_join_equals_brute_force_random(spark):
    """No-false-negative guarantee: pruned join == brute force on a
    seeded random corpus at two thresholds."""
    import itertools
    import random

    rng = random.Random(11)
    vocab = [f"t{i}" for i in range(12)]
    docs = [
        (i, " ".join(rng.sample(vocab, rng.randint(4, 10)))) for i in range(60)
    ]
    toksets = {i: frozenset(s.split()) for i, s in docs}
    for tau_num, tau_den in [(9, 10), (7, 10)]:
        got = set(_prefix_pairs(spark, docs, (tau_num, tau_den)))
        want = set()
        for a, b in itertools.combinations(sorted(toksets), 2):
            inter = len(toksets[a] & toksets[b])
            uni = len(toksets[a] | toksets[b])
            if tau_den * inter >= tau_num * uni:
                want.add((a, b))
        assert got == want


def test_entity_resolution_transitive_chain(spark):
    """ER capstone semantics on a crafted corpus: A~B and B~C under the
    blocking contract (same first token, |Δlen|<=2, prefix edit<=22)
    must resolve into ONE entity even though A~C may not match
    directly; an unrelated doc stays a singleton."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    base = "alpha " + "x" * 60
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            [
                (1, base),                      # len 66
                (2, base + "yy"),               # len 68: matches 1 (Δ2)
                (3, base + "yyzz"),             # len 70: matches 2, NOT 1
                (4, "omega " + "q" * 60),       # different token: singleton
            ],
            "doc_id long, text string",
        ).withColumn("n_chars", F.length("text")).toPandas().to_parquet(
            os.path.join(tmp, "documents.parquet")
        )
        got = {
            (r["entity_id"], r["n_members"])
            for r in QUERIES["pipeline_entity_resolution"](spark, tmp).collect()
        }
    assert got == {(1, 3), (4, 1)}


def test_global_rank_matches_sequential_order(spark):
    """Distributed two-pass rank == sequential ROW_NUMBER on a random
    frame with duplicate keys (id tie-break makes the order total),
    across enough rows that every range partition is populated."""
    import random

    from cirro_annotation_spark.operators.dedup import global_rank

    rng = random.Random(7)
    rows = [(i, rng.choice("abcdefgh") * rng.randint(1, 3)) for i in range(5000)]
    df = spark.createDataFrame(rows, "id long, k string")
    got = {
        r["id"]: r["rnk"] for r in global_rank(df, ["k", "id"]).collect()
    }
    want = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (t[1], t[0])))
    }
    assert got == want


def test_sorted_neighborhood_pairs_match_brute_window(spark):
    """Engine pairs == an imperative re-derivation of 'each record vs
    its w successors in (key, id) order' — including pairs that
    straddle range-partition boundaries (5k rows over 32 partitions
    forces ~31 boundary crossings)."""
    import random

    from cirro_annotation_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    rng = random.Random(11)
    rows = [
        (i, rng.choice(["alpha", "alpine", "beta", "betty", "gamma"]) +
         " " + "x" * rng.randint(0, 30))
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"])
        for r in sorted_neighborhood_pairs(
            df, window=4, key_chars=8, prefix_chars=20, max_edit=10
        ).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1,
                               prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    srt = sorted(rows, key=lambda t: (t[1].strip().lower()[:8], t[0]))
    want = set()
    for i, (ida, ta) in enumerate(srt):
        for j in range(i + 1, min(i + 5, len(srt))):
            idb, tb = srt[j]
            if lev(ta[:20], tb[:20]) <= 10:
                want.add((ida, idb))
    assert got == want and len(want) > 500


def test_incremental_er_equals_full_recompute(spark):
    """The invariant the incremental oracle proves, also pinned
    engine-vs-engine: on a corpus where a match CHAIN crosses the
    80% cutoff (old 1~2, bridge 2~8, incremental 8~10), batch
    increment and full recompute emit identical golden records."""
    import os
    import tempfile

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    base = "alpha " + "x" * 60
    rows = [
        (1, base),                 # old
        (2, base + "yy"),          # old: matches 1
        (8, base + "yyzz"),        # old: matches 2 (chain)
        (10, base + "yyzzww"),     # NEW (cutoff = MAX(id)*4//5 = 11*4//5 = 8): matches 8
        (11, "omega " + "q" * 60), # NEW singleton
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows, "doc_id long, text string"
        ).withColumn("n_chars", F.length("text")).toPandas().to_parquet(
            os.path.join(tmp, "documents.parquet")
        )
        full = {
            tuple(r)
            for r in QUERIES["pipeline_entity_resolution"](spark, tmp).collect()
        }
        inc = {
            tuple(r)
            for r in QUERIES["pipeline_entity_resolution_incremental"](
                spark, tmp
            ).collect()
        }
    assert inc == full
    assert {(e, n) for e, n, *_ in inc} == {(1, 4), (11, 1)}

def test_simhash_bucket_cap_splits_hot_buckets(spark):
    """VERDICT r10 weak #1: degenerate near-empty docs all hash to the
    same chunk buckets; with a bucket cap the hot bucket is sub-banded
    on the next chunk instead of self-joining quadratically. Identical
    docs (hamming 0) must still pair under the cap, and pairs living in
    small buckets must be unaffected."""
    from cirro_annotation_spark.operators.dedup import simhash_near_pairs

    # 60 identical near-empty docs (one hot bucket: sigs identical)
    # + 2 identical long docs in an otherwise-cold bucket
    rows = [(i, "a") for i in range(60)]
    long_text = " ".join(f"tok{j}" for j in range(40))
    rows += [(100, long_text), (101, long_text)]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    capped = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            df, "text", "doc_id", max_hamming=3, bucket_cap=10
        ).collect()
    }
    # identical signatures always stay together under sub-banding
    # (their next-chunk values agree too): all 60*59/2 pairs present
    assert (0, 1) in capped and (0, 59) in capped
    assert len([p for p in capped if p[0] < 60 and p[1] < 60]) == 60 * 59 // 2
    # the cold-bucket identical pair is untouched by the cap
    assert (100, 101) in capped

    uncapped = {
        (r.id_a, r.id_b)
        for r in simhash_near_pairs(
            df, "text", "doc_id", max_hamming=3, bucket_cap=None
        ).collect()
    }
    # on this fixture (identical-sig groups only) cap loses nothing
    assert capped == uncapped


def test_bounded_rank_per_key_mega_host(spark):
    """Skew fixture (VERDICT r11 #3): one mega-key holding 10k rows next
    to two small keys. The salted two-phase rank must return exactly the
    k smallest order values per key with correct 1..k ranks — identical
    to the unbounded window — while phase 1 keeps at most k rows per
    (key, salt) partition."""
    from cirro_annotation_spark.operators.dedup import bounded_rank_per_key

    rows = [(i, "mega.example.com") for i in range(10_000)]
    rows += [(20_000 + i, "tiny-a.example.com") for i in range(3)]
    rows += [(30_000 + i, "tiny-b.example.com") for i in range(7)]
    df = spark.createDataFrame(rows, "doc_id long, host string")

    got = {
        (r.host, r.doc_id, r.rnk_k)
        for r in bounded_rank_per_key(df, "host", "doc_id", k=5).collect()
    }
    want = {("mega.example.com", i, i + 1) for i in range(5)}
    want |= {("tiny-a.example.com", 20_000 + i, i + 1) for i in range(3)}
    want |= {("tiny-b.example.com", 30_000 + i, i + 1) for i in range(5)}
    assert got == want


def test_bounded_rank_per_key_equals_unbounded_window_random(spark):
    """Randomized equivalence: for arbitrary (key, order) multisets the
    salted two-phase rank must return exactly what the unbounded
    per-key window would for ranks <= k — any k, any duplicate/skew
    pattern, any salt bucketing. (Deterministic seeds; order col is
    unique per key by construction since rank ties would be
    partitioning-dependent in BOTH shapes.)"""
    import random

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from cirro_annotation_spark.operators.dedup import bounded_rank_per_key

    rng = random.Random(12012)
    for trial in range(3):
        n_keys = rng.randint(1, 6)
        rows = []
        used = set()
        for _ in range(rng.randint(1, 400)):
            key = f"k{rng.randint(0, n_keys)}"
            order = rng.randint(-1000, 1000)
            if (key, order) in used:
                continue
            used.add((key, order))
            rows.append((order, key))
        k = rng.randint(1, 7)
        salt = rng.choice([1, 2, 16, 64])
        df = spark.createDataFrame(rows, "doc_id long, host string")
        got = {
            (r.host, r.doc_id, r.rnk_k)
            for r in bounded_rank_per_key(
                df, "host", "doc_id", k=k, salt_buckets=salt
            ).collect()
        }
        w = Window.partitionBy("host").orderBy("doc_id")
        want = {
            (r.host, r.doc_id, r.rnk)
            for r in df.withColumn(
                "rnk", F.row_number().over(w).cast("long")
            )
            .filter(F.col("rnk") <= k)
            .collect()
        }
        assert got == want, f"trial {trial} k={k} salt={salt}"


def test_grouped_running_sum_matches_sequential(spark):
    """Range-partitioned grouped cumsum == a sequential per-group running
    total on a random value-grain frame (unique (g, v) rows, groups
    spanning many range partitions), including single-row groups and a
    group large enough to straddle partition boundaries."""
    import random

    from cirro_annotation_spark.operators.dedup import grouped_running_sum

    rng = random.Random(13)
    rows = []
    for g in ["a", "b", "hot", "z"]:
        n = 3000 if g == "hot" else rng.randint(1, 40)
        vals = rng.sample(range(100_000), n)
        rows += [(g, v, rng.randint(1, 9)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long, c long")
    got = {
        (r["g"], r["v"]): r["cum"]
        for r in grouped_running_sum(df, ["g"], ["v"], "c").collect()
    }
    want = {}
    for g in {r[0] for r in rows}:
        acc = 0
        for _, v, c in sorted(r for r in rows if r[0] == g):
            acc += c
            want[(g, v)] = acc
    assert got == want


def test_grouped_running_sum_empty(spark):
    from cirro_annotation_spark.operators.dedup import grouped_running_sum

    df = spark.createDataFrame([], "g string, v long, c long")
    out = grouped_running_sum(df, ["g"], ["v"], "c")
    assert out.count() == 0
    assert "cum" in out.columns


def test_grouped_running_sum_null_group(spark):
    """A NULL group key is a real group (SQL GROUP BY semantics): its
    rows must cumulate, not vanish through a non-null-safe join back
    onto the offset frame (ADVICE r14). Covers the all-None-group
    extreme, where schema inference on the offset frame would fail."""
    from cirro_annotation_spark.operators.dedup import grouped_running_sum

    rows = [(None, v, v + 1) for v in range(200)] + [
        ("a", v, 2) for v in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, v long, c long")
    out = {
        (r["g"], r["v"]): r["cum"]
        for r in grouped_running_sum(df, ["g"], ["v"], "c").collect()
    }
    assert len(out) == 250, "NULL-group rows were dropped"
    acc = 0
    for v in range(200):
        acc += v + 1
        assert out[(None, v)] == acc
    assert out[("a", 49)] == 100

    all_null = spark.createDataFrame(
        [(None, v, 1) for v in range(120)], "g string, v long, c long"
    )
    got = {
        r["v"]: r["cum"]
        for r in grouped_running_sum(all_null, ["g"], ["v"], "c").collect()
    }
    assert got == {v: v + 1 for v in range(120)}


def test_bounded_rank_per_key_tied_order_values_spread(spark):
    """A mega-key with a CONSTANT order value must still spread across
    salt buckets (salt hashes all columns, not just order_col — salting
    on the tied order value alone put every row in one bucket)."""
    from cirro_annotation_spark.operators.dedup import bounded_rank_per_key

    rows = [("hot", 0, i) for i in range(500)] + [("cold", 1, 0)]
    df = spark.createDataFrame(rows, "host string, score long, doc_id long")
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(64))
    n_buckets = df.filter(F.col("host") == "hot").select(salt.alias("s")).distinct().count()
    assert n_buckets > 16  # 500 distinct rows over 64 buckets

    out = bounded_rank_per_key(df, "host", "score", k=3).collect()
    per_key = {}
    for r in out:
        per_key.setdefault(r["host"], []).append(r["rnk_k"])
    assert sorted(per_key["hot"]) == [1, 2, 3]
    assert per_key["cold"] == [1]


def test_cc_star_keeps_self_loop_only_vertices(spark):
    """A vertex appearing ONLY in a self-loop must be a singleton
    component in BOTH algorithms — the _auto fallback must not change
    the vertex set (code-review r15)."""
    from cirro_annotation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(5, 5), (1, 2), (2, 3)], "id_a long, id_b long"
    )
    prop = {(r["vertex"], r["component"]) for r in connected_components(edges).collect()}
    star = {
        (r["vertex"], r["component"])
        for r in connected_components_star(edges).collect()
    }
    assert prop == star == {(1, 1), (2, 1), (3, 1), (5, 5)}


def test_bounded_rank_with_map_column_and_decimal_running_sum(spark):
    """Map-typed passthrough columns must not break the all-hashable
    salt; decimal(18,0) is a legal grouped_running_sum value type
    (code-review r15 second pass)."""
    from cirro_annotation_spark.operators.dedup import (
        bounded_rank_per_key,
        grouped_running_sum,
    )

    df = spark.createDataFrame(
        [("h", i, {"m": i}) for i in range(10)],
        "host string, doc_id long, meta map<string,long>",
    )
    out = bounded_rank_per_key(df, "host", "doc_id", k=3).collect()
    assert sorted(r["doc_id"] for r in out) == [0, 1, 2]

    dec = spark.createDataFrame([(1, 1, 5), (1, 2, 7)], "g long, o long, v long").select(
        "g", "o", F.col("v").cast("decimal(18,0)").alias("v")
    )
    got = {r["o"]: r["cum"] for r in grouped_running_sum(dec, ["g"], ["o"], "v").collect()}
    assert got == {1: 5, 2: 12}

    import pytest as _pytest

    frac = spark.createDataFrame([(1, 1, 0.5)], "g long, o long, v double")
    with _pytest.raises(TypeError, match="integral"):
        grouped_running_sum(frac, ["g"], ["o"], "v")

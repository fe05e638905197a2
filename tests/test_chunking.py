"""Property tests for docs_chunk_overlap (suites/text.py): the chunk
layout must be losslessly invertible and fully covering for ANY text,
not just the fixture corpus — the guarantee a retrieval index needs
(every character searchable, reconstruction possible from chunks).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

SIZE, STRIDE = 400, 300


def _spark_chunks(spark, tmp_path, texts):
    """Run the REGISTERED query against a synthetic documents table."""
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    pdf = pd.DataFrame(
        {
            "doc_id": range(len(texts)),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": ["prop"] * len(texts),
            "n_chars": [len(t) for t in texts],
        }
    )
    pq.write_table(pa.Table.from_pandas(pdf), str(tmp_path / "documents.parquet"))
    df = QUERIES["docs_chunk_overlap"](spark, str(tmp_path))
    out: dict[int, list] = {}
    for r in df.collect():
        out.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["chunk_start"], r["chunk_text"], r["chunk_len"])
        )
    return {k: sorted(v) for k, v in out.items()}


def test_chunk_reconstruction_and_coverage(spark, tmp_path):
    """For texts spanning every boundary case (empty, < size, == size,
    == size+1, multiple strides, non-ASCII): stride-prefixes concatenate
    back to the exact original, every char is covered, consecutive
    chunks overlap by exactly size-stride, and starts are 1 + i*stride."""
    texts = [
        "",
        "short",
        "x" * STRIDE,
        "y" * SIZE,
        "z" * (SIZE + 1),
        "αβγ" * 500,              # 1500 multibyte chars — substring is char-based
        "word " * 300,            # 1500 chars over several strides
    ]
    chunks = _spark_chunks(spark, tmp_path, texts)
    for doc_id, text in enumerate(texts):
        got = chunks[doc_id]
        n_expected = max(1, (max(len(text), 1) - 1) // STRIDE + 1)
        assert len(got) == n_expected, (doc_id, len(got), n_expected)
        recon = ""
        for i, (idx, start, ctext, clen) in enumerate(got):
            assert idx == i
            assert start == 1 + i * STRIDE
            assert clen == len(ctext)
            assert ctext == text[start - 1 : start - 1 + SIZE]
            recon += ctext[:STRIDE]
        assert recon == text, doc_id
        if len(got) > 1:  # consecutive chunks overlap by size - stride
            for (_, s1, t1, _), (_, s2, t2, _) in zip(got, got[1:]):
                if len(t1) == SIZE:
                    assert t1[STRIDE:] == t2[: SIZE - STRIDE]


def test_chunk_randomized_reconstruction(spark, tmp_path):
    """Seeded random lengths around every stride/size boundary; one Spark
    run for all examples (hypothesis-per-example would launch hundreds of
    jobs for no added coverage)."""
    import random

    rng = random.Random(42)
    lens = sorted(
        {rng.randrange(0, 4 * SIZE) for _ in range(40)}
        | {SIZE - 1, SIZE, SIZE + 1, STRIDE - 1, STRIDE, STRIDE + 1, 2 * STRIDE}
    )
    texts = [
        "".join(rng.choice("ab cd\nef") for _ in range(n)) for n in lens
    ]
    chunks = _spark_chunks(spark, tmp_path, texts)
    for doc_id, text in enumerate(texts):
        recon = "".join(c[2][:STRIDE] for c in chunks[doc_id])
        assert recon == text, (doc_id, len(text))

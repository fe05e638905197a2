"""Synthetic DSV fixture tree (FIXTURES.md §B) — the MAGeCK-shaped layout
the reference was built around: standard TSV/CSV files plus a
token-templated variable family (one dir per gene), with a gz member.

Deterministic content (fixed seed arithmetic, no RNG state dependence)
so golden tests and the driver's rows-only checks are stable.
"""

from __future__ import annotations

import gzip
import os

GENES = ("GENE_A", "GENE_B", "GENE_C")
SAMPLES = ("ctrl_r1", "ctrl_r2", "treat_r1", "treat_r2")

FIELDS_DICTIONARY = {
    "sgrna": {"name": "sgRNA", "desc": "guide RNA identifier"},
    "gene": {"name": "Gene", "desc": "target gene symbol"},
    "sample": {"name": "Sample", "desc": "sequencing sample"},
    "reads": {"name": "Reads", "desc": "read count"},
    "mapped": {"name": "Mapped", "desc": "mapped reads"},
    "percentage": {"name": "Percentage", "desc": "mapped fraction"},
    "zerocounts": {"name": "ZeroCounts", "desc": "guides with zero reads"},
    "giniindex": {"name": "GiniIndex", "desc": "count inequality"},
    "score": {"name": "Score", "desc": "RRA score"},
    "fdr": {"name": "FDR", "desc": "false discovery rate"},
    "lfc": {"name": "LFC", "desc": "log fold change"},
}


def _counts_rows(n: int = 100) -> list[str]:
    # Mixed-case headers exercise normalization; one 'NA' cell exercises
    # numeric coercion (run_annotate.py:23-27).
    rows = ["sgRNA\tGene\tctrl_r1\tctrl_r2\ttreat_r1\ttreat_r2"]
    for i in range(n):
        gene = f"G{i % 7}"
        treat1 = "NA" if i == 13 else str(200 + (i * 13) % 500)
        rows.append(
            f"sg{i:04d}\t{gene}\t{100 + (i * 7) % 400}\t{120 + (i * 11) % 380}"
            f"\t{treat1}\t{210 + (i * 17) % 490}"
        )
    return rows


def _summary_rows() -> list[str]:
    rows = ["sample,reads,mapped,percentage,zerocounts,giniindex"]
    for i, s in enumerate(SAMPLES):
        rows.append(f"{s},{1000000 + i * 5000},{900000 + i * 4000},0.9{i},{i * 3},0.1{i}")
    return rows


def _rra_rows(gene: str, n: int = 50) -> list[str]:
    g = sum(ord(c) for c in gene)
    rows = ["sgrna\tscore\tp.low\tp.high\tp.twosided\tfdr\tlfc"]
    for i in range(n):
        rows.append(
            f"sg{gene}_{i:03d}\t{(g + i) % 100 / 100:.4f}\t{(i % 50) / 100:.3f}"
            f"\t{(i % 40) / 100:.3f}\t{(i % 30) / 100:.3f}\t{(i % 20) / 100:.3f}"
            f"\t{((g + i * 3) % 200 - 100) / 25:.3f}"
        )
    return rows


def build_fixture_tree(root: str) -> str:
    """Materialize the FIXTURES.md §B tree under ``root``; returns the
    data directory path."""
    data = os.path.join(root, "data")
    combined = os.path.join(data, "mageck", "count", "combined")
    os.makedirs(combined, exist_ok=True)
    with open(os.path.join(combined, "counts.txt"), "w") as f:
        f.write("\n".join(_counts_rows()) + "\n")
    with open(os.path.join(data, "mageck", "count", "summary.csv"), "w") as f:
        f.write("\n".join(_summary_rows()) + "\n")
    for gene in GENES:
        gdir = os.path.join(data, "mageck", gene)
        os.makedirs(gdir, exist_ok=True)
        body = "\n".join(_rra_rows(gene)) + "\n"
        if gene == "GENE_C":
            with gzip.open(os.path.join(gdir, "rra.sgrna_summary.txt.gz"), "wt") as f:
                f.write(body)
        else:
            with open(os.path.join(gdir, "rra.sgrna_summary.txt"), "w") as f:
                f.write(body)
    return data

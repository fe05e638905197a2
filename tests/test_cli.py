"""CLI surface tests (python -m cirro_annotation_spark ...)."""
from __future__ import annotations

from cirro_annotation_spark.__main__ import main


def test_datasets_subcommand_lists_newest_first(spark, sf_dir, capsys):
    rc = main(
        [
            "datasets",
            "--table", f"{sf_dir}/orders.parquet",
            "--name-col", "o_orderpriority",
            "--id-col", "o_orderkey",
            "--created-col", "o_orderdate",
            "--limit", "5",
        ]
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.splitlines() if "\t" in l]
    assert len(lines) == 5
    days = [l.split("\t")[1] for l in lines]
    assert days == sorted(days, reverse=True)
    for line in lines:
        label = line.split("\t")[0]
        assert " - " in label

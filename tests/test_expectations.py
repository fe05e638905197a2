"""expectations_report: one-scan declarative quality gate."""

from cirro_annotation_spark.operators import expectations as E


def _report(spark, rows, rules):
    df = spark.createDataFrame(rows, "id long, name string, score long")
    out = E.expectations_report(df, rules).collect()
    return {r["rule"]: (r["violations"], r["passed"]) for r in out}


def test_rules_count_violations_including_nulls(spark):
    rows = [
        (1, "alice", 10),
        (2, "bob", 200),
        (2, None, None),   # dup id, null name, null score
        (3, "carol", -5),
    ]
    got = _report(
        spark,
        rows,
        [
            E.not_null("name"),
            E.unique("id"),
            E.in_range("score", 0, 100),
            E.in_set("name", ["alice", "bob"]),
            E.matches_regex("name", "^[ab]"),
            E.min_length("name", 4),
        ],
    )
    assert got["not_null"] == (1, False)
    assert got["unique"] == (1, False)             # id=2 twice
    assert got["in_range[0,100]"] == (3, False)    # 200, NULL, -5
    assert got["in_set[alice,bob]"] == (2, False)  # carol + NULL
    assert got["matches_regex[^[ab]]"] == (2, False)
    assert got["min_length[4]"] == (2, False)      # bob(3) + NULL


def test_all_green_on_clean_data(spark):
    rows = [(1, "alice", 10), (2, "bobby", 20)]
    got = _report(spark, rows, [E.not_null("name"), E.unique("id"),
                                E.in_range("score", 0, 100)])
    assert all(v == (0, True) for v in got.values())


def test_single_scan_plan(spark):
    """All rules must fold into one aggregation over one scan — no
    per-rule jobs (the whole point at 100 TB)."""
    df = spark.createDataFrame([(1, "a", 2)], "id long, name string, score long")
    out = E.expectations_report(
        df, [E.not_null("name"), E.in_range("score", 0, 10),
             E.matches_regex("name", "a"), E.min_length("name", 1)]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Scan ExistingRDD") + plan.count("Scan parquet") == 1


def test_quoted_labels_survive(spark):
    """Round-6 advice: rule labels containing single quotes (e.g. a
    regex matching O'Brien-style names) must not break the unpivot —
    the report is built from typed literals, not a generated SQL
    string."""
    rows = [(1, "O'Brien", 5), (2, "alice", 7)]
    got = _report(spark, rows, [E.matches_regex("name", "^O'")])
    assert got["matches_regex[^O']"] == (1, False)  # alice violates


def test_empty_rules_raise(spark):
    import pytest

    df = spark.createDataFrame([(1, "a", 2)], "id long, name string, score long")
    with pytest.raises(ValueError, match="at least one rule"):
        E.expectations_report(df, [])


def test_in_set_with_none_means_null_allowed(spark):
    """A None in the allowed list must mean 'NULL allowed' — previously
    it poisoned isin into SQL NULL, counting ZERO violations for any
    out-of-set value (code-review r15)."""
    from cirro_annotation_spark.operators import expectations as E

    df = spark.createDataFrame(
        [("ok",), ("bad",), (None,), ("err",)], "status string"
    )
    rep = {
        r["rule"]: r["violations"]
        for r in E.expectations_report(
            df,
            [
                E.in_set("status", ["ok", "err", None]),
                E.in_set("status", ["ok", "err"]),
            ],
        ).collect()
    }
    assert rep["in_set[ok,err,NULL]"] == 1  # only 'bad'
    assert rep["in_set[ok,err]"] == 2  # 'bad' and the NULL


def test_in_set_label_distinguishes_null_from_none_string(spark):
    from cirro_annotation_spark.operators import expectations as E

    assert E.in_set("c", ["ok", None])["rule"] == "in_set[ok,NULL]"
    assert E.in_set("c", ["ok", "None"])["rule"] == "in_set[ok,None]"

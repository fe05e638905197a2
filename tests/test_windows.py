

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


def test_spc_rules_fire_on_planted_shift(spark, tmp_path):
    """The fixture's stationary values keep the WE rules silent (an
    in-control process — rule sums are ~0 in the driver data), so the
    TRUE paths are pinned here on a crafted series: a +large mean shift
    in the last TWO days must fire rule 1 (beyond 3 sigma) and rule 2
    (2-of-3 beyond 2 sigma) — the shift must be SHORT because the
    center line and sigma are full-series (a sustained shift inflates
    sigma until nothing is 3-sigma out; 2 of 30 shifted days give
    z ~ 3.7) — and a mild +shift run fires rule 4 (8 consecutive same
    side). Flags also cross-checked against the
    registered DuckDB oracle on the same parquet."""
    import datetime

    import duckdb

    from cirro_annotation_spark.registry import ORACLES, QUERIES, load_all_suites

    load_all_suites()
    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day in range(30):
        for i in range(5):
            # type A: mean 100, huge shift after day 19
            v = 100.0 + (0.5 * ((day * 5 + i) % 7)) + (500.0 if day >= 28 else 0.0)
            rows.append((eid, base + datetime.timedelta(days=day, minutes=i),
                         1, "A", v, "{}"))
            eid += 1
            # type B: mean 50, mild +1 shift after day 19 (same-side run)
            v2 = 50.0 + (0.3 * ((day * 5 + i) % 5)) + (1.0 if day >= 20 else -1.0)
            rows.append((eid, base + datetime.timedelta(days=day, minutes=i),
                         2, "B", v2, "{}"))
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "spc")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    out = QUERIES["events_spc_rules"](spark, path)
    got = {
        (r["event_type"], str(r["day"])): (r["rule1"], r["rule2"], r["rule4"])
        for r in out.collect()
    }
    assert got[("A", "2024-01-29")][0] == 1  # beyond 3 sigma
    assert got[("A", "2024-01-30")][1] == 1  # 2-of-3 beyond 2 sigma
    assert got[("B", "2024-01-28")][2] == 1  # 8th consecutive same side
    assert sum(v[0] for v in got.values()) > 0
    assert sum(v[1] for v in got.values()) > 0
    assert sum(v[2] for v in got.values()) > 0

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW events AS SELECT * FROM '{path}/events.parquet/*.parquet'"
    )
    want = {
        (r[0], str(r[1])): (r[3], r[4], r[5])
        for r in con.sql(ORACLES["events_spc_rules"]).fetchall()
    }
    assert {k: v for k, v in got.items()} == want


def test_cep_pattern_counts_on_crafted_timeline(spark, tmp_path):
    """Pattern semantics pinned on a hand-built journey where every
    count is known: greedy non-overlapping matching, the [^p]* guard
    (a purchase between view and click kills the funnel match), and
    ts-order independence from arrival order (rows are written
    shuffled; the symbol string must still follow ts, event_id)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    # user 1: v c p v e c p  -> funnel 2 (vcp + vecp), strict 1, err 1
    u1 = ["view", "click", "purchase", "view", "error", "click", "purchase"]
    # user 2: v p c p        -> funnel 0 (p between v and c), strict 0
    u2 = ["view", "purchase", "click", "purchase"]
    rows = []
    eid = 0
    for uid, seq in ((1, u1), (2, u2)):
        for i, et in enumerate(seq):
            rows.append(
                (eid, base + datetime.timedelta(minutes=i), uid, et, 1.0, "{}")
            )
            eid += 1
    rows.reverse()  # arrival order is the REVERSE of event-time order
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "cep")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    got = {
        r["user_id"]: (
            r["n_funnel"], r["n_strict_funnel"], r["n_error_recovery"]
        )
        for r in QUERIES["events_cep_pattern"](spark, path).collect()
    }
    assert got[1] == (2, 1, 1)
    assert got[2] == (0, 0, 0)


def test_holt_fold_matches_python_recursion(spark, sf_dir):
    """The F.aggregate fold must equal the reference recursion run in
    exact Python ints over the same day-sorted cents series — level,
    trend, and anomaly count, for every event type."""
    from pyspark.sql import functions as F

    from cirro_annotation_spark.registry import QUERIES, load_all_suites
    from cirro_annotation_spark.suites.util import t

    load_all_suites()
    daily = (
        t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.greatest(
                F.round(F.sum("value") * 100, 0).cast("long"),
                F.lit(0).cast("long"),
            ).alias("x")
        )
        .collect()
    )
    series: dict[str, list[tuple]] = {}
    for r in daily:
        series.setdefault(r["event_type"], []).append((r["day"], r["x"]))
    want = {}
    for et, pts in series.items():
        l = b = anom = 0
        for _, x in sorted(pts):
            pred = l + b
            if pred > 0 and x >= 3 * pred:
                anom += 1
            new_l = (pred + x) >> 1
            b = (b + (new_l - l)) >> 1
            l = new_l
        want[et] = (len(pts), l, b, l + b, anom)
    got = {
        r["event_type"]: (
            r["n_days"], r["level_cents"], r["trend_cents"],
            r["forecast_next_cents"], r["n_anomalies"],
        )
        for r in QUERIES["events_holt_linear_daily"](spark, sf_dir).collect()
    }
    assert got == want


def test_holt_trend_tracks_planted_ramp(spark, tmp_path):
    """On a pure linear ramp x_d = 1000*d cents the alpha=beta=1/2
    recursion must converge to trend ~= slope (it reaches the exact
    slope lag-free region within ~10 days; assert a tight band) and
    fire zero anomalies (no day triples the forecast)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = [
        (d, base + datetime.timedelta(days=d), 1, "ramp", 10.0 * (d + 1), "{}")
        for d in range(30)
    ]
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "holt")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    (r,) = QUERIES["events_holt_linear_daily"](spark, path).collect()
    assert r["n_days"] == 30
    assert 800 <= r["trend_cents"] <= 1200  # slope is 1000 cents/day
    assert r["n_anomalies"] == 0
    assert abs(r["level_cents"] - 30000) <= 3000


def test_backtest_holt_wins_on_ramp_ewma_on_noise_free_level(spark, tmp_path):
    """Model selection pinned where theory predicts it: on a linear
    ramp the trend model must win (EWMA lags a ramp by ~the slope);
    on a flat level both converge and EWMA's smaller lag-in must not
    lose — and the error sums must equal the dual recursion run in
    exact Python ints."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for d in range(30):
        rows.append((eid, base + datetime.timedelta(days=d), 1, "ramp",
                     10.0 * (d + 1), "{}"))
        eid += 1
        rows.append((eid, base + datetime.timedelta(days=d), 2, "flat",
                     500.0, "{}"))
        eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "bt")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    got = {
        r["event_type"]: r
        for r in QUERIES["events_forecast_backtest"](spark, path).collect()
    }
    assert got["ramp"]["winner"] == "holt"

    def dual(xs):
        e = l = b = err_e = err_h = 0
        for rn, x in enumerate(xs, start=1):
            if rn >= 2:
                err_e += abs(x - e)
                err_h += abs(x - (l + b))
            new_l = (l + b + x) >> 1
            b = (b + (new_l - l)) >> 1
            l = new_l
            e = (e + x) >> 1
        return err_e, err_h

    ramp_e, ramp_h = dual([1000 * (d + 1) for d in range(30)])
    assert got["ramp"]["mae_ewma_cents"] == ramp_e // 29
    assert got["ramp"]["mae_holt_cents"] == ramp_h // 29
    flat_e, flat_h = dual([50000] * 30)
    assert got["flat"]["mae_ewma_cents"] == flat_e // 29
    assert got["flat"]["mae_holt_cents"] == flat_h // 29
    assert flat_e <= flat_h  # EWMA locks a flat level at least as fast


def test_bootstrap_ci_brackets_mean_and_narrows_with_n(spark, tmp_path):
    """Statistical sanity on crafted data: the 95% CI must bracket the
    point estimate, and a 25x larger sample of the same distribution
    must yield a strictly narrower interval (the 1/sqrt(n) contract
    the Poisson bootstrap exists to estimate)."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for n, et in ((40, "small"), (1000, "big")):
        for i in range(n):
            rows.append(
                (eid, base + datetime.timedelta(minutes=i), 1, et,
                 100.0 + (i % 7) * 10.0, "{}")
            )
            eid += 1
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "boot")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    got = {
        r["event_type"]: r
        for r in QUERIES["events_bootstrap_ci"](spark, path).collect()
    }
    for r in got.values():
        assert r["ci_lo_cents"] <= r["mean_cents"] <= r["ci_hi_cents"]
    w_small = got["small"]["ci_hi_cents"] - got["small"]["ci_lo_cents"]
    w_big = got["big"]["ci_hi_cents"] - got["big"]["ci_lo_cents"]
    assert w_big < w_small


def test_poisson_weights_match_distribution(spark):
    """The pinned threshold ladder must reproduce Poisson(1): over 64k
    deterministic draws the weight frequencies sit within 2% of
    e^-1/k!, and the mean weight within 2% of 1."""
    import math

    from pyspark.sql import functions as F
    from cirro_annotation_spark.suites.windows import _POIS_T

    ids = spark.range(65536)
    bucket = F.conv(
        F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10
    ).cast("long")
    wt = F.lit(len(_POIS_T))
    for k in range(len(_POIS_T) - 1, -1, -1):
        wt = F.when(bucket < _POIS_T[k], F.lit(k)).otherwise(wt)
    counts = {
        r["w"]: r["n"]
        for r in ids.select(wt.alias("w")).groupBy("w").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    n = 65536
    mean = sum(k * c for k, c in counts.items()) / n
    assert abs(mean - 1.0) < 0.02
    for k in (0, 1, 2):
        want = math.exp(-1) / math.factorial(k)
        assert abs(counts[k] / n - want) < 0.02


def test_dow_profile_planted_weekend_peak(spark, tmp_path):
    """A series spending 3x on Saturdays must flag Saturday (dow=6) as
    the unique peak, with the seasonal index in the exact integer-ppm
    band the construction implies, and indexes summing weekday-weighted
    to ~1e6."""
    import datetime

    base = datetime.datetime(2024, 1, 1)  # a Monday
    rows = []
    for d in range(28):  # four exact weeks
        day = base + datetime.timedelta(days=d)
        v = 300.0 if day.weekday() == 5 else 100.0  # Saturday spike
        rows.append((d, day, 1, "shop", v, "{}"))
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "dow")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    out = {
        r["dow"]: r
        for r in QUERIES["events_dow_profile"](spark, path).collect()
    }
    assert len(out) == 7 and all(r["n_days"] == 4 for r in out.values())
    peaks = [d for d, r in out.items() if r["is_peak"] == 1]
    assert peaks == [6]  # Saturday, 0=Sunday numbering
    # index(sat) = dow_sum*total_days*1e6 // (total_sum*dow_days)
    #            = 300/(weekly mean) = 7/3 exactly -> 2_333_333 floored
    assert out[6]["index_ppm"] == (4 * 30000 * 28 * 1_000_000) // (
        4 * (6 * 10000 + 30000) * 4
    )
    assert out[6]["index_ppm"] == 2_333_333
    assert out[0]["mean_cents"] == 10000


def test_survival_km_hand_computed_with_censoring(spark, tmp_path):
    """KM pinned by hand on 4 sessions (durations 10, 10, 20, 30+
    minutes, the last still open at stream end): the censored session
    must leave the risk set WITHOUT stepping the curve, and each step
    must equal floor(ln((n-d)/n)*1e6) cumulatively."""
    import datetime
    import math

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def session(uid, start_h, dur_min):
        nonlocal eid
        for m in (0, dur_min):
            rows.append(
                (eid, base + datetime.timedelta(hours=start_h, minutes=m),
                 uid, "view", 1.0, "{}")
            )
            eid += 1

    session(1, 0, 10)
    session(2, 10, 10)
    session(3, 20, 20)
    session(4, 30, 30)  # ends at the stream max -> censored (< 1h gap)
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "km")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    out = {
        r["t"]: r
        for r in QUERIES["events_survival_km"](spark, path).collect()
    }
    # censored 30-min session contributes NO row (d=0 at t=30)
    assert set(out) == {10, 20}
    assert out[10]["d"] == 2 and out[10]["n_risk"] == 4
    assert out[20]["d"] == 1 and out[20]["n_risk"] == 2
    s10 = math.floor(math.log(2 / 4) * 1e6)
    s20 = s10 + math.floor(math.log(1 / 2) * 1e6)
    assert out[10]["log_surv_micro"] == s10
    assert out[20]["log_surv_micro"] == s20


def test_ivm_increment_equals_recompute(spark, sf_dir):
    """The merged base+delta rollup must equal the direct full
    recompute cell-for-cell (cents AND counts) — the IVM contract the
    shared oracle pins on the driver, asserted here engine-side."""
    from pyspark.sql import functions as F

    from cirro_annotation_spark.registry import QUERIES, load_all_suites
    from cirro_annotation_spark.suites.util import t

    load_all_suites()
    got = {
        (r["event_type"], str(r["day"])): (r["cents"], r["n_events"])
        for r in QUERIES["events_daily_rollup_ivm"](spark, sf_dir).collect()
    }
    want = {
        (r["event_type"], str(r["day"])): (r["cents"], r["n"])
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.round(F.sum("value") * 100, 0).cast("long").alias("cents"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
        .collect()
    }
    assert got == want


def test_conversion_latency_hand_computed(spark, tmp_path):
    """Crafted journeys pin the semantics: only purchases strictly
    AFTER the first view convert; a purchase-before-view user counts
    as a viewer but not a conversion; p50/p95 are the exact value-
    grain order statistics."""
    import datetime

    base = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0

    def ev(uid, minute, et):
        nonlocal eid
        rows.append(
            (eid, base + datetime.timedelta(minutes=minute), uid, et, 1.0, "{}")
        )
        eid += 1

    # converters with latencies 10, 20, 30, 40 minutes
    for uid, latm in ((1, 10), (2, 20), (3, 30), (4, 40)):
        ev(uid, 0, "view")
        ev(uid, latm, "purchase")
    ev(5, 10, "purchase")  # purchase BEFORE first view: no conversion
    ev(5, 20, "view")
    ev(6, 0, "view")       # never purchases
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / "conv")
    df.coalesce(1).write.parquet(path + "/events.parquet")

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    (r,) = QUERIES["events_conversion_latency"](spark, path).collect()
    assert r["n_viewers"] == 6 and r["n_converted"] == 4
    assert r["conversion_ppm"] == (4 * 1_000_000) // 6
    assert r["p50_latency_min"] == 20  # cc*2 >= 4 first at m=20
    assert r["p95_latency_min"] == 40


def test_recursive_clamped_balance_matches_closed_form(spark, sf_dir):
    """The production query computes the clamp recurrence
    b_t = max(0, b_{t-1} + d_t) via the closed form
    b_T = S_T - min(0, min_{k<=T} S_k) (optimization r15). This test
    keeps the literal Spark WITH RECURSIVE formulation as the
    identity's in-engine witness: both final balances AND clamp-event
    counts must agree for every user (exact integer cents, no rounding
    surface)."""
    from pyspark.sql import functions as F

    from cirro_annotation_spark.registry import QUERIES, load_all_suites
    from cirro_annotation_spark.suites.util import t

    load_all_suites()
    got = {
        r["user_id"]: (r["final_cents"], r["n_clamped"])
        for r in QUERIES["sql_recursive_clamped_balance"](
            spark, sf_dir
        ).collect()
    }

    try:
        spark.conf.set("spark.sql.cteRecursionRowLimit", str(200_000_000))
    except Exception:
        pass
    t(spark, sf_dir, "events").createOrReplaceTempView("__rc_test_events")
    spark.sql("""
        WITH m AS (SELECT MIN(to_date(ts)) AS d0 FROM __rc_test_events)
        SELECT user_id,
               CAST(datediff(to_date(ts), m.d0) + 1 AS BIGINT) AS t,
               CAST(SUM(CASE WHEN event_type IN ('purchase', 'error')
                             THEN -2 ELSE 1 END
                        * CAST(FLOOR(value * 100) AS BIGINT))
                    AS BIGINT) AS delta
        FROM __rc_test_events CROSS JOIN m
        GROUP BY user_id, datediff(to_date(ts), m.d0) + 1
    """).localCheckpoint(eager=False).createOrReplaceTempView(
        "__rc_test_deltas"
    )
    recursive = {
        r["user_id"]: (r["final_cents"], r["n_clamped"])
        for r in spark.sql("""
        WITH RECURSIVE bal(user_id, t, cents, n_clamped) AS (
          SELECT user_id, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM (SELECT DISTINCT user_id FROM __rc_test_deltas)
          UNION ALL
          SELECT b.user_id, b.t + 1,
                 GREATEST(CAST(0 AS BIGINT),
                          b.cents + COALESCE(d.delta, CAST(0 AS BIGINT))),
                 b.n_clamped
                   + CASE
                       WHEN b.cents + COALESCE(d.delta, CAST(0 AS BIGINT)) < 0
                       THEN 1 ELSE 0 END
          FROM bal b LEFT JOIN __rc_test_deltas d
            ON d.user_id = b.user_id AND d.t = b.t + 1
          WHERE b.t < 28
        )
        SELECT user_id, cents AS final_cents, n_clamped
        FROM bal WHERE t = 28
    """).collect()
    }
    assert got == recursive


def _tiny_events(spark, tmp_path, rows, name):
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    path = str(tmp_path / name)
    df.coalesce(1).write.parquet(path + "/events.parquet")
    return path


def test_markov_next_hand_computed(spark, tmp_path):
    """One user with sequence v,c,v,c,p: transitions v->c x2, c->v,
    c->p; row-normalized ppm and the count-desc/name-asc argmax."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    seq = ["view", "click", "view", "click", "purchase"]
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, et, 1.0, "{}")
        for i, et in enumerate(seq)
    ]
    path = _tiny_events(spark, tmp_path, rows, "mkv")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    got = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["ppm"], r["is_top"])
        for r in QUERIES["events_markov_next"](spark, path).collect()
    }
    assert got[("view", "click")] == (2, 1_000_000, 1)
    # click splits 1/1 between purchase and view; tie-break name-asc
    assert got[("click", "purchase")] == (1, 500_000, 1)
    assert got[("click", "view")] == (1, 500_000, 0)
    assert len(got) == 3


def test_theil_sen_hand_computed(spark, tmp_path):
    """Daily counts 1,2,4 on consecutive days: pairwise slopes are
    (2-1)/1=1, (4-1)/2=1.5, (4-2)/1=2 per day-step; the lower median
    of {1.0, 1.5, 2.0} is 1.5 -> 1_500_000 ppm."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for day, n in [(0, 1), (1, 2), (2, 4)]:
        for k in range(n):
            rows.append(
                (
                    eid,
                    base + dt.timedelta(days=day, minutes=k),
                    1,
                    "view",
                    1.0,
                    "{}",
                )
            )
            eid += 1
    path = _tiny_events(spark, tmp_path, rows, "ts")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    (r,) = QUERIES["events_theil_sen_trend"](spark, path).collect()
    assert r["n_days"] == 3 and r["n_pairs"] == 3
    assert r["slope_ppm_med"] == 1_500_000


def test_conformal_qhat_rule_hand_computed(spark, tmp_path):
    """Nine residual-bearing days (10 days total): n_cal = 6, n_test=3,
    k = least(6, ceil(0.9*7)) = least(6, 7) = 6 -> qhat is the LARGEST
    calibration residual, so calibration coverage would be 100% and
    test coverage counts residuals <= that max."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    cents = [100, 100, 100, 100, 100, 100, 100, 100, 100, 100]
    rows = [
        (i, base + dt.timedelta(days=i), 1, "view", c / 100.0, "{}")
        for i, c in enumerate(cents)
    ]
    path = _tiny_events(spark, tmp_path, rows, "conf")
    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    (r,) = QUERIES["events_conformal_intervals"](spark, path).collect()
    assert r["n_cal"] == 6 and r["n_test"] == 3
    # constant series: EWMA converges upward from 0 (50, 75, ...), so
    # residuals shrink monotonically; qhat = 6th smallest of the first
    # 6 residuals = the largest calibration one = |100-50| = 50 at
    # rn=2 ... wait: residuals start at rn=2: |100-ewma_1|=|100-50|=50,
    # then 25, 13, 7, 4, 2 (shift halving) -> qhat = 50; the 3 test
    # residuals (1, 1, 0) are all <= 50 -> coverage 1e6 ppm.
    assert r["qhat_cents"] == 50
    assert r["coverage_ppm"] == 1_000_000


def test_user_streaks_islands_arithmetic(spark):
    """Gaps-and-islands on a planted fixture: user 1 active on days
    1-3, 5, 7-8 (streaks 3/1/2); user 2 active once with duplicate
    same-day events (dedup to one active day)."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = []
    eid = 0
    for d in (1, 2, 3, 5, 7, 8):
        eid += 1
        rows.append((eid, datetime(2024, 1, d, 12, 0), 1, "view", 1.0, "{}"))
    for _ in range(3):  # three events, same day -> one active day
        eid += 1
        rows.append((eid, datetime(2024, 1, 10, 9, 0), 2, "view", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r["user_id"]: (r["max_streak"], r["active_days"], r["n_streaks"])
            for r in QUERIES["events_user_streaks"](spark, tmp).collect()
        }
    assert out == {1: (3, 6, 3), 2: (1, 1, 1)}


def test_acf_alternating_series_signs(spark):
    """An alternating daily count (1,3,1,3,...) must give strongly
    negative lag-1 ACF, positive lag-2, and a cumulative Ljung-Box Q
    that never decreases with lag."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = []
    eid = 0
    for d in range(1, 21):
        for _ in range(1 if d % 2 else 3):
            eid += 1
            rows.append(
                (eid, datetime(2024, 1, d, 8, 0), 1, "view", 1.0, "{}")
            )
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = sorted(
            QUERIES["events_acf_ljung_box"](spark, tmp).collect(),
            key=lambda r: r["lag"],
        )
    assert [r["lag"] for r in out] == list(range(1, 8))
    # dense series: n_pairs = n - lag
    assert [r["n_pairs"] for r in out] == [20 - k for k in range(1, 8)]
    assert out[0]["acf"] < -0.8
    assert out[1]["acf"] > 0.8
    qs = [r["lb_q"] for r in out]
    assert all(b >= a for a, b in zip(qs, qs[1:]))


def test_changepoint_finds_planted_step(spark):
    """A 5/day -> 50/day step after day 10 must rank the day-10 split
    first, with exact segment sums."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = []
    eid = 0
    for d in range(1, 21):
        for _ in range(5 if d <= 10 else 50):
            eid += 1
            rows.append(
                (eid, datetime(2024, 1, d, 8, 0), 1, "view", 1.0, "{}")
            )
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r["gain_rank"]: r
            for r in QUERIES["events_changepoint_binseg"](spark, tmp).collect()
        }
    best = out[1]
    assert str(best["split_day"]) == "2024-01-10"
    assert best["n_left"] == 10 and best["n_right"] == 10
    assert best["sum_left"] == 50 and best["sum_right"] == 500


def test_max_drawdown_planted_series(spark):
    """Daily cents 100, 50, 120, 30, 80: cumulative 100,150,270,300,380
    never falls — drawdown 0 — so flip signs on two days to plant a
    real trough: 100, 50, -120, -30, 80 -> cum 100,150,30,0,80; peak
    150; max drawdown 150 at day 4 (earliest deepest)."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    vals = [100.0, 50.0, -120.0, -30.0, 80.0]
    rows = [
        (i, datetime(2024, 1, 1 + i, 12, 0), 1, "view", v, "{}")
        for i, v in enumerate(vals)
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["events_max_drawdown"](spark, tmp).collect()
    assert len(out) == 1
    r = out[0]
    assert str(r["trough_day"]) == "2024-01-04"
    assert r["peak_cents"] == 15000 and r["trough_cents"] == 0
    assert r["drawdown_cents"] == 15000 and r["drawdown_ppm"] == 1000000


def test_linear_attribution_equal_shares(spark):
    """One purchase preceded by 3 touches (2 clicks, 1 view) inside the
    window and 1 click outside it: clicks earn 2*(1e6 div 3), view
    earns 1*(1e6 div 3); the stale touch earns nothing."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows = [
        (1, datetime(2024, 1, 1), 1, "click", 1.0, "{}"),   # 9 days before: stale
        (2, datetime(2024, 1, 5), 1, "click", 1.0, "{}"),
        (3, datetime(2024, 1, 6), 1, "view", 1.0, "{}"),
        (4, datetime(2024, 1, 7), 1, "click", 1.0, "{}"),
        (5, datetime(2024, 1, 10), 1, "purchase", 1.0, "{}"),
    ]
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = {
            r["channel"]: (r["n_touches"], r["n_conversions"], r["credit_ppm"])
            for r in QUERIES["events_attribution_linear"](spark, tmp).collect()
        }
    share = 1_000_000 // 3
    assert out == {"click": (2, 1, 2 * share), "view": (1, 1, share)}


def test_runs_test_alternating_is_positive(spark):
    """A perfectly alternating daily series has the maximum number of
    runs -> strongly positive z (more runs than chance)."""
    import os
    import tempfile
    from datetime import datetime

    from cirro_annotation_spark.registry import QUERIES, load_all_suites

    load_all_suites()
    rows, eid = [], 0
    for d in range(1, 22):
        for _ in range(1 if d % 2 else 5):
            eid += 1
            rows.append((eid, datetime(2024, 1, d, 9, 0), 1, "v", 1.0, "{}"))
    with tempfile.TemporaryDirectory() as tmp:
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string, "
            "value double, props string",
        ).toPandas().to_parquet(os.path.join(tmp, "events.parquet"))
        out = QUERIES["events_runs_test"](spark, tmp).collect()
    r = out[0]
    assert r["n_runs"] == r["n_up"] + r["n_down"]  # every delta flips sign
    assert r["z_score"] > 2.0

"""Semantic tests for operators.timeseries (gapfill / ffill / interpolate /
funnel) — golden small cases plus the chunked-grid boundary property and a
pandas parity check, the reference's golden-collected-output pattern
(ref: pipe/node_test.go:47-77)."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from pipes_spark.operators.timeseries import (
    forward_fill,
    funnel,
    funnel_counts,
    gapfill,
    linear_interpolate,
)


def _ts(s):
    return datetime.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def sparse_series(spark):
    rows = [
        ("a", _ts("2024-01-01 00:00:00"), 1.0),
        ("a", _ts("2024-01-01 03:00:00"), 4.0),
        ("a", _ts("2024-01-01 07:00:00"), 8.0),
        ("b", _ts("2024-01-01 05:00:00"), 5.0),
        ("b", _ts("2024-01-01 06:00:00"), 6.0),
    ]
    return spark.createDataFrame(rows, "k string, bucket timestamp, v double")


def test_gapfill_densifies_and_nulls_gaps(spark, sparse_series):
    out = gapfill(sparse_series, ["k"], "bucket", "1 hour", ["v"])
    got = {(r.k, r.bucket.hour): r.v for r in out.collect()}
    # a spans hours 0..7 inclusive → 8 rows; b spans 5..6 → 2 rows
    assert len(got) == 10
    assert got[("a", 0)] == 1.0 and got[("a", 3)] == 4.0 and got[("a", 7)] == 8.0
    for h in (1, 2, 4, 5, 6):
        assert got[("a", h)] is None
    assert got[("b", 5)] == 5.0 and got[("b", 6)] == 6.0


@pytest.mark.parametrize("chunk", [1, 2, 3, 7, 8, 9, 1024])
def test_gapfill_chunking_invariant(spark, sparse_series, chunk):
    """The two-level segmented grid must be identical for every chunk size —
    including chunks that divide the span exactly, exceed it, and chunk=1."""
    out = gapfill(sparse_series, ["k"], "bucket", "1 hour", ["v"], chunk=chunk)
    rows = sorted((r.k, r.bucket, r.v) for r in out.collect())
    baseline = sorted(
        (r.k, r.bucket, r.v)
        for r in gapfill(sparse_series, ["k"], "bucket", "1 hour", ["v"]).collect()
    )
    assert rows == baseline


def test_gapfill_bounds_per_row_arrays(spark):
    """A long span with a small chunk must produce many bounded segment rows
    (scale guard: no single row materializes the whole grid)."""
    rows = [("k", _ts("2024-01-01 00:00:00"), 0.0), ("k", _ts("2024-03-01 00:00:00"), 1.0)]
    df = spark.createDataFrame(rows, "k string, bucket timestamp, v double")
    out = gapfill(df, ["k"], "bucket", "1 hour", ["v"], chunk=64)
    assert out.count() == 60 * 24 + 1  # Jan 1 .. Mar 1 inclusive, hourly


def test_forward_fill_matches_pandas(spark, sf_dir):
    from pipes_spark.sources import load_table

    ev = (
        load_table(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(F.col("event_type") == "purchase", F.col("value")).alias("v"),
        )
    )
    got = forward_fill(ev, ["user_id"], ["ts", "event_id"], ["v"]).toPandas()
    pdf = ev.toPandas().sort_values(["user_id", "ts", "event_id"])
    want = pdf.groupby("user_id")["v"].ffill()
    merged = got.set_index("event_id")
    for eid, w in zip(pdf["event_id"], want):
        g = merged.loc[eid, "v_ffill"]
        assert (g != g and w != w) or g == w  # NaN-safe equality


def test_linear_interpolate_golden(spark):
    rows = [
        ("k", _ts("2024-01-01 00:00:00"), 0.0),
        ("k", _ts("2024-01-01 01:00:00"), None),
        ("k", _ts("2024-01-01 02:00:00"), None),
        ("k", _ts("2024-01-01 04:00:00"), 8.0),
        ("k", _ts("2024-01-01 05:00:00"), None),  # trailing gap stays NULL
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = linear_interpolate(df, ["k"], ["ts"], "v")
    got = {r.ts.hour: r.v_interp for r in out.collect()}
    assert got[0] == 0.0
    assert got[1] == pytest.approx(2.0)  # 1/4 of the way 0→8
    assert got[2] == pytest.approx(4.0)
    assert got[4] == 8.0
    assert got[5] is None


def test_funnel_golden(spark):
    rows = [
        # u1 completes view→click→purchase in order
        (1, _ts("2024-01-01 00:00:00"), "view"),
        (1, _ts("2024-01-01 00:10:00"), "click"),
        (1, _ts("2024-01-01 00:20:00"), "purchase"),
        # u2: purchase BEFORE view/click → only depth 2
        (2, _ts("2024-01-01 00:00:00"), "purchase"),
        (2, _ts("2024-01-01 00:05:00"), "view"),
        (2, _ts("2024-01-01 00:06:00"), "click"),
        # u3: never views → not in result
        (3, _ts("2024-01-01 00:00:00"), "click"),
        # u4: view only
        (4, _ts("2024-01-01 00:00:00"), "view"),
        # u5: click ties view's timestamp (>= contract: tie counts)
        (5, _ts("2024-01-01 00:00:00"), "view"),
        (5, _ts("2024-01-01 00:00:00"), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    out = {r.user_id: r for r in funnel(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()}
    assert set(out) == {1, 2, 4, 5}
    assert out[1].depth == 3 and out[1].t3 == _ts("2024-01-01 00:20:00")
    assert out[2].depth == 2 and out[2].t3 is None  # purchase precedes click
    assert out[4].depth == 1 and out[4].t2 is None
    assert out[5].depth == 2  # tie at-or-after counts
    counts = {
        r.step: r.n_users
        for r in funnel_counts(df, "user_id", "ts", "event_type", ["view", "click", "purchase"]).collect()
    }
    assert counts == {1: 4, 2: 3, 3: 1}  # step2 reached by u1, u2, u5


def test_funnel_preserves_key_column_name_collisions(spark):
    """type_col values equal to output aliases must not be mis-resolved
    (the filter runs before the rename) and the key keeps its name."""
    rows = [(1, _ts("2024-01-01 00:00:00"), "user"), (1, _ts("2024-01-01 00:01:00"), "ts")]
    df = spark.createDataFrame(rows, "uid long, ts timestamp, etype string")
    out = funnel(df, "uid", "ts", "etype", ["user", "ts"])
    assert out.columns == ["uid", "t1", "t2", "depth"]
    r = out.collect()[0]
    assert r.uid == 1 and r.depth == 2


def test_scd2_point_in_time_golden(spark):
    """Version resolution edges: facts before the key's first version and
    unknown keys keep NULL; each fact matches exactly one version."""
    from pipes_spark.operators.relational import scd2_point_in_time

    dim = spark.createDataFrame(
        [
            (1, "v1", _ts("2020-01-01 00:00:00"), _ts("2021-01-01 00:00:00"), False),
            (1, "v2", _ts("2021-01-01 00:00:00"), None, True),
            (2, "w1", _ts("2020-06-01 00:00:00"), None, True),
        ],
        "k long, val string, valid_from timestamp, valid_to timestamp, is_current boolean",
    )
    facts = spark.createDataFrame(
        [
            (10, 1, _ts("2020-06-15 00:00:00")),  # inside v1
            (11, 1, _ts("2021-01-01 00:00:00")),  # boundary: valid_from inclusive -> v2
            (12, 1, _ts("2019-12-31 00:00:00")),  # before first version -> NULL
            (13, 2, _ts("2024-01-01 00:00:00")),  # open version
            (14, 9, _ts("2024-01-01 00:00:00")),  # unknown key -> NULL
        ],
        "fid long, k long, at timestamp",
    )
    out = {
        r.fid: r.pit_val
        for r in scd2_point_in_time(facts, dim, "k", "k", "at", ["val"]).collect()
    }
    assert out == {10: "v1", 11: "v2", 12: None, 13: "w1", 14: None}


def test_sessionize_bucketed_equals_global(spark, sf_dir):
    """The two-pass bucketed sessionize must assign the IDENTICAL
    (user, event) -> session_id mapping as the single-window global
    sessionize on the real events table."""
    from pipes_spark.operators.relational import sessionize, sessionize_bucketed
    from pipes_spark.sources import load_table

    ev = load_table(spark, sf_dir, "events")
    plain = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize(ev, "user_id", "ts", 1800, order_tiebreak="event_id").collect()
    }
    bucketed = {
        (r.user_id, r.event_id): r.session_id
        for r in sessionize_bucketed(
            ev, "user_id", "ts", 1800, bucket="day", order_tiebreak="event_id"
        ).collect()
    }
    assert bucketed == plain


def test_sessionize_bucketed_boundary_cases(spark):
    """Sessions crossing midnight (gap <= threshold) must merge; a whole
    empty day must split; equality at exactly the gap must merge (the >
    contract); invalid bucket/gap combos must raise."""
    import pytest as _pytest

    from pipes_spark.operators.relational import sessionize_bucketed

    rows = [
        (1, 1, _ts("2024-01-01 23:50:00")),
        (2, 1, _ts("2024-01-02 00:10:00")),  # 20 min across midnight -> same session
        (3, 1, _ts("2024-01-02 00:40:00")),  # exactly 30 min -> still same (> breaks)
        (4, 1, _ts("2024-01-04 00:40:00")),  # empty Jan 3 -> new session
        (5, 2, _ts("2024-01-01 10:00:00")),  # other user independent
    ]
    df = spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp")
    got = {
        r.event_id: r.session_id
        for r in sessionize_bucketed(
            df, "user_id", "ts", 1800, bucket="day", order_tiebreak="event_id"
        ).collect()
    }
    assert got[1] == got[2] == got[3] == 1
    assert got[4] == 2
    assert got[5] == 1
    with _pytest.raises(ValueError):
        sessionize_bucketed(df, "user_id", "ts", 90000, bucket="day")


def test_forecast_linear_recovers_trend(spark):
    from datetime import datetime, timedelta

    from pipes_spark.operators.timeseries import forecast_linear

    t0 = datetime(2024, 3, 1)
    rows = [("k", t0 + timedelta(days=i), 10.0 + 2.0 * i) for i in range(10)]
    df = spark.createDataFrame(rows, "g string, ts timestamp, v double")
    out = {r["step_ahead"]: r for r in
           forecast_linear(df, ["g"], "ts", "v", horizon=3, step="1 day").collect()}
    assert set(out) == {1, 2, 3}
    # perfect line: next points continue the trend exactly
    for h in (1, 2, 3):
        assert out[h]["yhat"] == pytest.approx(10.0 + 2.0 * (9 + h), abs=1e-3)
        assert out[h]["ts"] == t0 + timedelta(days=9 + h)


def test_association_rules_lift_semantics(spark):
    from datetime import datetime, timedelta

    from pipes_spark.operators.relational import association_rules

    t0 = datetime(2024, 1, 1)
    rows = []
    # 10 users: sessions where "view" and "click" always co-occur, and
    # "error" appears alone in separate sessions
    for u in range(10):
        rows += [(u, t0 + timedelta(hours=u), "view", 100 + u * 3),
                 (u, t0 + timedelta(hours=u, minutes=5), "click", 101 + u * 3),
                 (u, t0 + timedelta(hours=u + 6), "error", 102 + u * 3)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string, event_id long")
    out = {(r["type_a"], r["type_b"]): r for r in
           association_rules(df, "user_id", "ts", "event_type",
                             gap_seconds=1800, order_tiebreak="event_id").collect()}
    assert ("click", "view") in out
    r = out[("click", "view")]
    assert r["support"] == 10
    # 20 sessions total; view and click each in 10, always together:
    # lift = (10/20) / ((10/20)*(10/20)) = 2.0
    assert r["lift"] == pytest.approx(2.0)
    assert ("click", "error") not in out and ("error", "view") not in out
    # empty input: construction stays lazy (no eager count) and the
    # in-plan N produces an empty pair table, not a division error
    empty = spark.createDataFrame([], "user_id long, ts timestamp, event_type string, event_id long")
    assert association_rules(empty, "user_id", "ts", "event_type",
                             gap_seconds=1800, order_tiebreak="event_id").count() == 0


def test_cohort_retention_golden(spark):
    from datetime import datetime

    from pipes_spark.operators.relational import cohort_retention

    # cohort A (week of Jan 1): users 1,2 — user 1 returns next week;
    # cohort B (week of Jan 8): user 3 only
    rows = [
        (1, datetime(2024, 1, 2)), (2, datetime(2024, 1, 3)),
        (1, datetime(2024, 1, 10)),
        (3, datetime(2024, 1, 9)),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    out = {(r["cohort"], r["period_offset"]): r for r in
           cohort_retention(df, "user_id", "ts", grain="week").collect()}
    a = datetime(2024, 1, 1)
    b = datetime(2024, 1, 8)
    assert out[(a, 0)]["n_active"] == 2 and out[(a, 0)]["retention"] == 1.0
    assert out[(a, 1)]["n_active"] == 1 and out[(a, 1)]["retention"] == 0.5
    assert out[(b, 0)]["n_active"] == 1 and out[(b, 0)]["cohort_size"] == 1
    assert set(out) == {(a, 0), (a, 1), (b, 0)}


def test_autocorrelation_matches_numpy(spark):
    import numpy as np

    from pipes_spark.operators.timeseries import autocorrelation

    rng = np.random.RandomState(7)
    x = np.round(np.sin(np.arange(40) * 2 * np.pi / 8) * 10 + rng.randn(40), 3)
    rows = [("a", i, float(v)) for i, v in enumerate(x)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = {r["lag"]: r for r in
           autocorrelation(df, ["k"], "t", "v", max_lag=8).collect()}
    mu = x.mean()
    c = x - mu
    den = float((c * c).sum())
    for k in range(1, 9):
        expect = float((c[k:] * c[:-k]).sum()) / den
        assert out[k]["acf"] == pytest.approx(expect, abs=1e-4), k
        assert out[k]["n_pairs"] == 40 - k
    # period-8 sinusoid: strong positive ACF at the period, negative at half
    assert out[8]["acf"] > 0.7 and out[4]["acf"] < -0.7
    # constant series → zero denominator → NULL, not a DIVIDE_BY_ZERO throw
    const = spark.createDataFrame([("c", i, 5.0) for i in range(10)],
                                  "k string, t int, v double")
    vals = autocorrelation(const, ["k"], "t", "v", max_lag=3).collect()
    assert vals and all(r["acf"] is None for r in vals)


def test_partial_autocorrelation_matches_yule_walker(spark):
    import numpy as np

    from pipes_spark.operators.timeseries import partial_autocorrelation

    rng = np.random.RandomState(19)
    # AR(2): x_t = 0.6 x_{t-1} - 0.3 x_{t-2} + e
    x = np.zeros(300)
    for t in range(2, 300):
        x[t] = 0.6 * x[t - 1] - 0.3 * x[t - 2] + rng.randn()
    x = x.round(6)
    df = spark.createDataFrame([("a", i, float(v)) for i, v in enumerate(x)],
                               "k string, t int, v double")
    got = {r["lag"]: r["pacf"] for r in
           partial_autocorrelation(df, ["k"], "t", "v", max_lag=6).collect()}
    # independent check: PACF at lag k = last coefficient of the
    # Yule-Walker Toeplitz solve of order k on the same biased ACF
    c = x - x.mean()
    den = float((c * c).sum())
    r = np.array([(c[k:] * c[:-k]).sum() / den for k in range(1, 7)])
    r = np.round(r, 6)  # the operator consumes the rounded ACF column
    for k in range(1, 7):
        R = np.eye(k)
        for i in range(k):
            for j in range(k):
                if i != j:
                    R[i, j] = r[abs(i - j) - 1]
        phi = np.linalg.solve(R, r[:k])
        assert got[k] == pytest.approx(phi[-1], abs=1e-3), k
    # AR(2) signature: PACF cuts off after lag 2
    assert abs(got[1]) > 0.3 and abs(got[2]) > 0.2
    assert all(abs(got[k]) < 0.15 for k in (3, 4, 5, 6))


def test_harmonic_regression_recovers_planted_cycle(spark):
    import math
    from datetime import date, timedelta

    from pipes_spark.operators.timeseries import harmonic_regression

    d0 = date(2024, 1, 1)
    rows = []
    for t in range(56):  # 8 weeks, clean weekly cycle + trend
        v = 100.0 + 0.5 * t + 10.0 * math.sin(2 * math.pi * t / 7) \
            + 4.0 * math.cos(2 * math.pi * 2 * t / 7)
        rows.append((d0 + timedelta(days=t), round(v, 6)))
    df = spark.createDataFrame(rows, "day date, v double")
    got = {r["feature"]: r["coef"]
           for r in harmonic_regression(df, "day", "v", 7.0, 2).collect()}
    assert got["intercept"] == pytest.approx(100.0, abs=0.05)
    assert got["_t"] == pytest.approx(0.5, abs=0.01)
    assert got["amplitude_1"] == pytest.approx(10.0, abs=0.05)
    assert got["amplitude_2"] == pytest.approx(4.0, abs=0.05)
    # missing days must not break the fit (parametric, not positional)
    df2 = df.filter(F.dayofmonth("day") % 5 != 0)
    got2 = {r["feature"]: r["coef"]
            for r in harmonic_regression(df2, "day", "v", 7.0, 2).collect()}
    assert got2["amplitude_1"] == pytest.approx(10.0, abs=0.2)

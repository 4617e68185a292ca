"""Little's law, MTBF/MTTR, SPC charts, HHI — hand cases + the
telescoping conservation invariant."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.activity import hhi_hourly
from timeseriescorrelation_spark.operators.queueing import (
    littles_law,
    mtbf_mttr,
)
from timeseriescorrelation_spark.operators.spc import c_chart, p_chart

BASE = dt.datetime(2026, 1, 1)


def _sessions(spark, spans):
    return spark.createDataFrame(
        [
            (BASE + dt.timedelta(minutes=a), BASE + dt.timedelta(minutes=b))
            for a, b in spans
        ],
        ["session_start", "session_end_ts"],
    )


def test_littles_law_hand_case(spark):
    # one session 00:30 -> 01:30: splits evenly across two hours
    out = {
        r["hour_ts"].hour: r
        for r in littles_law(_sessions(spark, [(30, 90)])).collect()
    }
    assert out[0]["arrivals"] == 1
    assert out[0]["w_mean_sec"] == 3600.0
    assert out[0]["l_arrival"] == 1.0
    assert out[0]["l_observed"] == 0.5
    assert out[1]["arrivals"] == 0
    assert out[1]["w_mean_sec"] is None
    assert out[1]["l_observed"] == 0.5


def test_littles_law_conservation(spark):
    # every second of session time lands in exactly one hour's busy
    # integral AND one arrival's duration: sums telescope
    spans = [(0, 45), (10, 250), (70, 70), (100, 380), (200, 201)]
    rows = littles_law(_sessions(spark, spans)).collect()
    assert sum(r["l_observed"] for r in rows) == pytest.approx(
        sum(r["l_arrival"] for r in rows), abs=1e-5
    )
    total_min = sum(b - a for a, b in spans)
    assert sum(r["l_arrival"] for r in rows) == pytest.approx(
        total_min / 60.0, abs=1e-5
    )


def _series(spark, hours, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(hours=h), 1.0) for h in hours],
        ["metric", "ts", "value"],
    )


def test_mtbf_mttr_hand_case(spark):
    # observed hours 0,1,2, 5,6, 10 -> downs: (3,4)=2h and (7,8,9)=3h
    out = mtbf_mttr(_series(spark, [0, 1, 2, 5, 6, 10])).collect()[0]
    assert out["total_hours"] == 11
    assert out["down_hours"] == 5
    assert out["n_down_runs"] == 2
    assert out["mttr_hours"] == 2.5
    # up runs: 3h, 2h, 1h -> mtbf = 2.0
    assert out["mtbf_hours"] == 2.0
    assert out["availability"] == pytest.approx(6 / 11, abs=1e-6)


def test_mtbf_no_downtime(spark):
    out = mtbf_mttr(_series(spark, [0, 1, 2, 3])).collect()[0]
    assert out["down_hours"] == 0 and out["n_down_runs"] == 0
    assert out["availability"] == 1.0
    assert out["mttr_hours"] is None
    assert out["mtbf_hours"] == 4.0


def _valued(spark, rows, metric="a"):
    # rows: (day, value)
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(days=d, minutes=i), float(v))
         for i, (d, v) in enumerate(rows)],
        ["metric", "ts", "value"],
    )


def test_p_chart_flags_spike_day(spark):
    # days 0-4: 1 defect in 10; day 5: 9 defects in 10
    rows = []
    for d in range(5):
        rows += [(d, 200.0)] + [(d, 50.0)] * 9
    rows += [(d := 5, 200.0)] * 9 + [(5, 50.0)]
    out = {r["day_ts"].day: r for r in p_chart(_valued(spark, rows)).collect()}
    assert out[1]["ooc"] == 0
    assert out[6]["ooc"] == 1          # day 5 -> Jan 6
    assert all(r["lcl"] >= 0.0 for r in out.values())
    # centerline: 14 defects / 60 obs
    assert out[1]["p_bar"] == pytest.approx(14 / 60, abs=1e-6)


def test_c_chart_missing_day_is_zero_and_low(spark):
    # 40 events/day on days 0,1,2,4 and nothing on day 3
    rows = [(d, 1.0) for d in (0, 1, 2, 4) for _ in range(40)]
    out = {r["day_ts"].day: r for r in c_chart(_valued(spark, rows)).collect()}
    assert out[4]["c"] == 0
    # c_bar = 160/5 = 32, lcl = 32 - 3*sqrt(32) > 0 -> day 3 is ooc low
    assert out[4]["ooc"] == -1
    assert out[1]["ooc"] == 0
    assert out[1]["c_bar"] == 32.0


def _events(spark, rows):
    # rows: (hour, event_type, copies)
    data = []
    for h, et, copies in rows:
        for c in range(copies):
            data.append((BASE + dt.timedelta(hours=h, seconds=c), et, 1))
    return spark.createDataFrame(data, ["ts", "event_type", "user_id"])


def test_hhi_monopoly_and_balanced(spark):
    df = _events(spark, [(0, "x", 8), (1, "x", 5), (1, "y", 5)])
    out = {r["hour_ts"].hour: r for r in hhi_hourly(df).collect()}
    assert out[0]["hhi"] == 1.0 and out[0]["hhi_norm"] is None
    assert out[1]["hhi"] == 0.5 and out[1]["hhi_norm"] == 0.0


def test_hhi_bounds(spark):
    df = _events(spark, [(0, "x", 7), (0, "y", 2), (0, "z", 1)])
    r = hhi_hourly(df).collect()[0]
    # shares .7 .2 .1 -> hhi = .49+.04+.01 = .54
    assert r["hhi"] == pytest.approx(0.54, abs=1e-6)
    assert 0.0 < r["hhi_norm"] < 1.0
    assert r["n_cats"] == 3 and r["n"] == 10


def test_dispersion_hand_values(spark):
    from timeseriescorrelation_spark.operators.queueing import (
        dispersion_test,
    )

    # daily counts per metric A: [1,3,1,3,1,3,1,3] -> mean 2,
    # chi2 = (8*40 - 256)/16 = 4.0, D = 4/7
    rows = []
    for day in range(8):
        n = 1 if day % 2 == 0 else 3
        rows += [("A", BASE + dt.timedelta(days=day, hours=h))
                 for h in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = dispersion_test(df).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_days == 8
    assert r.mean_count == pytest.approx(2.0)
    assert r.chi2 == pytest.approx(4.0, abs=1e-9)
    assert r.dispersion_index == pytest.approx(4.0 / 7.0, abs=1e-6)


def test_dispersion_constant_counts_zero(spark):
    from timeseriescorrelation_spark.operators.queueing import (
        dispersion_test,
    )

    # exactly 2 events every day -> variance 0 -> D = 0 (paced)
    rows = [("A", BASE + dt.timedelta(days=day, hours=h))
            for day in range(8) for h in range(2)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = dispersion_test(df).collect()[0]
    assert r.chi2 == pytest.approx(0.0)
    assert r.dispersion_index == pytest.approx(0.0)


def test_rate_ratio_hand_values(spark):
    from timeseriescorrelation_spark.operators.queueing import (
        rate_ratio_weekend,
    )

    # BASE = Thu 2026-01-01. Weekdays Thu-Fri + Mon-Tue (Jan 1,2,5,6)
    # 2 events each = 8; weekends Jan 3,4,10,11: 4 events each = 16.
    # RR = (16/4)/(8/4) = 2; e = .5, N = 24, z = (16-12)/sqrt(6)
    rows = []
    for day, n in ((0, 2), (1, 2), (4, 2), (5, 2),
                   (2, 4), (3, 4), (9, 4), (10, 4)):
        rows += [("A", BASE + dt.timedelta(days=day, hours=h))
                 for h in range(n)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = rate_ratio_weekend(df).collect()
    assert len(r) == 1
    r = r[0]
    assert r.days_weekday == 4 and r.days_weekend == 4
    assert r.events_weekday == 8 and r.events_weekend == 16
    assert r.rate_ratio == pytest.approx(2.0)
    assert r.z == pytest.approx(4.0 / 6.0 ** 0.5, abs=2e-6)


def test_rate_ratio_equal_rates_z_zero(spark):
    from timeseriescorrelation_spark.operators.queueing import (
        rate_ratio_weekend,
    )

    rows = [("A", BASE + dt.timedelta(days=day, hours=h))
            for day in range(14) for h in range(3)]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp")
    r = rate_ratio_weekend(df).collect()[0]
    assert r.rate_ratio == pytest.approx(1.0)
    assert r.z == pytest.approx(0.0, abs=1e-9)

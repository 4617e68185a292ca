"""Welch t + Mann-Whitney weekend two-sample tests."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.nptests import (
    mann_whitney_weekend,
    welch_t_weekend,
)

MON = dt.datetime(2026, 1, 5)   # Monday


def _series(spark, day_vals, metric="m"):
    return spark.createDataFrame(
        [(metric, MON + dt.timedelta(days=d), float(v))
         for d, v in day_vals.items()],
        ["metric", "ts", "value"],
    )


def _mk(weekday_val, weekend_val, n_weeks=4):
    vals = {}
    for d in range(n_weeks * 7):
        dow = d % 7
        base = weekend_val if dow in (5, 6) else weekday_val
        vals[d] = base + 0.01 * d     # deterministic jitter, no ties
    return vals


def test_welch_identical_arms_t_near_zero(spark):
    out = welch_t_weekend(_series(spark, _mk(10.0, 10.0))).collect()[0]
    assert out["n_weekday"] == 20 and out["n_weekend"] == 8
    assert abs(out["t_stat"]) < 2.0
    assert abs(out["mean_diff"]) < 0.2


def test_welch_shift_detected_with_hand_value(spark):
    import statistics

    vals = _mk(10.0, 100.0)
    out = welch_t_weekend(_series(spark, vals)).collect()[0]
    wd = [int(round(v * 100)) for d, v in vals.items() if d % 7 < 5]
    we = [int(round(v * 100)) for d, v in vals.items() if d % 7 >= 5]
    vx, vy = statistics.variance(wd), statistics.variance(we)
    a, b = vx / len(wd), vy / len(we)
    t = (statistics.mean(we) - statistics.mean(wd)) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / (len(wd) - 1) + b * b / (len(we) - 1))
    assert out["t_stat"] == pytest.approx(t, abs=1e-4)
    assert out["df"] == pytest.approx(df, abs=1e-3)
    assert out["mean_diff"] == pytest.approx(90.0, abs=0.2)


def test_mann_whitney_complete_separation(spark):
    vals = _mk(10.0, 100.0)
    out = mann_whitney_weekend(_series(spark, vals)).collect()[0]
    # every weekend value above every weekday value: U2 = 2*nx*ny
    assert out["u2_stat"] == 2 * 20 * 8
    assert out["z"] > 3.0


def test_mann_whitney_identical_arms_z_small(spark):
    out = mann_whitney_weekend(
        _series(spark, _mk(10.0, 10.0))
    ).collect()[0]
    assert abs(out["z"]) < 2.0


def test_mann_whitney_all_tied_null_z(spark):
    vals = {d: 5.0 for d in range(28)}
    out = mann_whitney_weekend(_series(spark, vals)).collect()[0]
    # every value tied: variance collapses to <= 0 -> NULL z
    assert out["u2_stat"] == 20 * 8
    assert out["z"] is None

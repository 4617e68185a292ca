"""Pettitt changepoint test."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.changepoint import pettitt_test

BASE = dt.datetime(2026, 1, 1)


def _series(spark, vals, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(days=d), float(v))
         for d, v in enumerate(vals)],
        ["metric", "ts", "value"],
    )


def test_pettitt_finds_the_shift_day(spark):
    vals = [10.0] * 10 + [50.0] * 10
    out = pettitt_test(_series(spark, vals)).collect()[0]
    # max |U_t| at the last pre-shift day (day index 9): U = 10*10
    assert out["k_stat"] == 100
    assert (out["change_day"] - BASE).days == 9
    assert out["p_approx"] < 0.01


def test_pettitt_hand_u_statistic(spark):
    # strictly increasing: U_t = (t+1)*(T-1-t) pairs all +1;
    # max at the middle
    vals = [float(i) for i in range(12)]
    out = pettitt_test(_series(spark, vals)).collect()[0]
    assert out["k_stat"] == 6 * 6
    assert (out["change_day"] - BASE).days == 5


def test_pettitt_constant_series_k_zero(spark):
    out = pettitt_test(_series(spark, [7.0] * 10)).collect()[0]
    assert out["k_stat"] == 0
    assert out["p_approx"] == 1.0


def test_pettitt_spike_resistant(spark):
    # one huge spike mid-series but no level shift: K stays small
    vals = [10.0] * 9 + [10000.0] + [10.0] * 10
    out = pettitt_test(_series(spark, vals)).collect()[0]
    # a single outlier contributes at most (T-1) to any U_t
    assert out["k_stat"] <= len(vals) - 1
    assert out["p_approx"] > 0.5

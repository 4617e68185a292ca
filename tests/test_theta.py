"""Theta forecast (operators/analytics.theta_forecast): matches a
brute-force numpy reference (OLS trend + SES on the θ=2 line); a pure
linear ramp forecasts its own extrapolation; short series drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.analytics import theta_forecast

T0 = dt.datetime(2024, 3, 1)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, per_metric):
    rows = []
    for metric, values in per_metric.items():
        for i, v in enumerate(values):
            rows.append(("c", metric, T0 + dt.timedelta(days=i), i,
                         float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _theta_ref(vals, alpha=0.5, h=1):
    y = np.array([round(v * 100) for v in vals], dtype=np.float64)
    n = len(y)
    t = np.arange(1, n + 1, dtype=np.float64)
    b = ((n * (t * y).sum() - t.sum() * y.sum())
         / (n * (t * t).sum() - t.sum() ** 2))
    a = (y.sum() - b * t.sum()) / n
    q = 2 * y - (a + b * t)
    lvl = q[0]
    for v in q[1:]:
        lvl = (1 - alpha) * lvl + alpha * v
    return (0.5 * lvl + 0.5 * (a + b * (n + h))) / 100.0


def test_matches_numpy(spark):
    rng = np.random.default_rng(23)
    vals = np.round(rng.normal(40, 6, 30) + np.arange(30) * 0.8, 2)
    df = _mk(spark, {"m": vals})
    r = theta_forecast(df).collect()[0]
    assert r.n_days == 30
    for h, got in ((1, r.fc_1), (7, r.fc_7)):
        want = _theta_ref(vals, h=h)
        assert abs(got - want) < 1e-5, (h, got, want)


def test_linear_ramp_extrapolates(spark):
    vals = [10.0 + 2.0 * i for i in range(20)]
    df = _mk(spark, {"m": vals})
    r = theta_forecast(df).collect()[0]
    # y_t = 10 + 2(t-1): trend fits exactly, θ=2 line equals the
    # series, SES lags but the combination still lands within the
    # last few steps' scale; fc_1 must continue the ramp closely.
    assert abs(r.fc_1 - 50.0) < 2.0
    assert r.fc_7 > r.fc_1  # upward trend preserved


def test_short_series_drop(spark):
    df = _mk(spark, {"m": [1.0] * 5})
    assert theta_forecast(df).collect() == []

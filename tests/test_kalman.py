"""Local-level Kalman filter (operators/analytics.kalman_level):
constant input ⇒ level == input with gains decaying from 1; a step
input is tracked monotonically; gains are data-independent (two
metrics, same length ⇒ identical gain sequences)."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.analytics import kalman_level

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _daily(spark, *metric_values):
    rows = []
    for metric, values in metric_values:
        for i, v in enumerate(values):
            rows.append(("c", metric, T0 + dt.timedelta(days=i), i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_constant_input_level_constant_gain_decays(spark):
    out = sorted(
        kalman_level(_daily(spark, ("m", [50.0] * 30))).collect(),
        key=lambda r: r.day_ts,
    )
    assert all(r.level == 50.0 for r in out)
    gains = [r.gain for r in out]
    assert gains[0] == 1.0
    assert all(a > b for a, b in zip(gains, gains[1:]))
    # steady-state gain for q/r = 0.01: k* = (sqrt(1.04)-0.2)/2 ~ 0.095
    assert abs(gains[-1] - 0.095) < 0.01


def test_step_is_tracked_monotonically(spark):
    vals = [10.0] * 15 + [100.0] * 15
    out = sorted(
        kalman_level(_daily(spark, ("m", vals))).collect(),
        key=lambda r: r.day_ts,
    )
    lv = [r.level for r in out]
    assert max(lv[:15]) <= 10.0 + 1e-9
    post = lv[15:]
    assert all(a < b for a, b in zip(post, post[1:])) or post[0] > 10.0
    assert post[-1] > 60.0  # converging toward 100


def test_gains_are_data_independent(spark):
    out = kalman_level(
        _daily(spark, ("a", [float(i) for i in range(20)]),
               ("b", [float((i * 7) % 13) for i in range(20)]))
    ).collect()
    ga = [r.gain for r in sorted(
        (r for r in out if r.metric == "a"), key=lambda r: r.day_ts)]
    gb = [r.gain for r in sorted(
        (r for r in out if r.metric == "b"), key=lambda r: r.day_ts)]
    assert ga == gb

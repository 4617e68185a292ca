"""Theta backtest (operators/analytics.theta_backtest): on a pure
linear ramp the theta forecast beats persistence decisively
(mase << 1); a flat holdout yields NULL mase; counts split correctly."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.analytics import theta_backtest

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


def test_ramp_beats_persistence(spark):
    vals = [10.0 + 3.0 * i for i in range(30)]
    r = theta_backtest(_mk(spark, {"m": vals})).collect()[0]
    assert r.n_train == 23 and r.n_test == 7
    # persistence is off by 3,6,...,21 (mean 12); theta ≈ SES with
    # drift b/2, so its ramp error is b(h+1)/2 (mean 7.5) — better
    # than persistence but not magic (the classic theta half-drift).
    assert r.mae_naive == 12.0
    assert r.mae_theta == 7.5
    assert r.mase == 0.625


def test_flat_holdout_null_mase(spark):
    vals = [float(5 + (i % 3)) for i in range(23)] + [7.0] * 7
    # naive = last train value; holdout all equal... make naive exact:
    vals[22] = 7.0  # last train value equals every holdout value
    r = theta_backtest(_mk(spark, {"m": vals})).collect()[0]
    assert r.mae_naive == 0.0 and r.mase is None


def test_noisy_mase_near_reasonable(spark):
    rng = np.random.default_rng(41)
    vals = np.round(rng.normal(100, 4, 40), 2)
    r = theta_backtest(_mk(spark, {"m": vals})).collect()[0]
    assert r.n_train == 33 and r.n_test == 7
    assert r.mae_theta > 0 and r.mase is not None

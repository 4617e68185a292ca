"""Dickey-Fuller unit-root test (operators/tsdiag.df_unitroot):
matches a brute-force numpy OLS t-stat; mean-reverting noise rejects
the unit root, a driftless random walk keeps it; degenerates drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.tsdiag import df_unitroot

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, per_metric):
    rows = []
    for metric, values in per_metric.items():
        for i, v in enumerate(values):
            ts = T0 + dt.timedelta(hours=i)
            rows.append(("c", metric, ts, i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _df_ref(vals):
    """OLS Δy = α + γ·y_{t-1} on cent integers; returns (γ, t)."""
    y = np.array([round(v * 100) for v in vals], dtype=np.float64)
    x, z = y[:-1], np.diff(y)
    m = len(x)
    X = np.column_stack([np.ones(m), x])
    beta, *_ = np.linalg.lstsq(X, z, rcond=None)
    resid = z - X @ beta
    s2 = (resid @ resid) / (m - 2)
    cov = s2 * np.linalg.inv(X.T @ X)
    return beta[1], beta[1] / np.sqrt(cov[1, 1])


def test_matches_numpy_ols(spark):
    rng = np.random.default_rng(9)
    noise = np.round(rng.normal(50, 5, 60), 2)          # stationary
    walk = np.round(100 + np.cumsum(rng.normal(0, 1, 60)), 2)
    df = _mk(spark, {"noise": noise, "walk": walk})
    out = {r.metric: r for r in df_unitroot(df).collect()}
    for m, vals in (("noise", noise), ("walk", walk)):
        g, t = _df_ref(vals)
        assert out[m].n_obs == 59
        assert abs(out[m].gamma - g) < 1e-5
        assert abs(out[m].t_stat - t) < 1e-4, (m, out[m].t_stat, t)
    assert not out["noise"].has_unit_root   # strong mean reversion
    assert out["walk"].has_unit_root
    assert out["noise"].t_stat < out["walk"].t_stat


def test_degenerates_drop(spark):
    df = _mk(spark, {
        "short": [1.0, 2.0, 3.0],
        "const": [5.0] * 30,                 # Czz = 0 -> det = 0
        "ramp": [float(i) for i in range(30)],  # Δy const -> det = 0
    })
    assert df_unitroot(df).collect() == []

"""KPSS level-stationarity test (operators/tsdiag.kpss_level): equals
a brute-force numpy KPSS (Bartlett, L=6) on a fixed series; white
noise keeps the stationarity null, a strong random-walk path rejects
it; short and constant series drop."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.tsdiag import kpss_level

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


def _kpss_ref(vals, max_lag=6):
    """Textbook KPSS on the cent-integer series."""
    y = np.array([round(v * 100) for v in vals], dtype=np.float64)
    n = len(y)
    e = y - y.mean()
    s = np.cumsum(e)
    num = (s * s).sum() / (n * n)
    # Bartlett long-run variance
    lrv = (e * e).sum() / n
    for k in range(1, max_lag + 1):
        w = 1 - k / (max_lag + 1)
        lrv += 2 * w * (e[:-k] * e[k:]).sum() / n
    return num / lrv


def test_matches_numpy_reference(spark):
    rng = np.random.default_rng(5)
    noise = np.round(rng.normal(10, 2, 48), 2)
    walk = np.round(10 + np.cumsum(rng.normal(0.8, 0.3, 48)), 2)
    df = _mk(spark, {"noise": noise, "walk": walk})
    out = {r.metric: r for r in kpss_level(df).collect()}
    for m, vals in (("noise", noise), ("walk", walk)):
        want = _kpss_ref(vals)
        assert abs(out[m].eta - want) < 1e-5, (m, out[m].eta, want)
        assert out[m].n_hours == 48
    assert out["noise"].is_level_stationary
    assert not out["walk"].is_level_stationary
    assert out["walk"].eta > out["noise"].eta


def test_degenerate_series_drop(spark):
    df = _mk(spark, {
        "short": [1.0, 2.0, 3.0],          # < min_hours
        "const": [5.0] * 30,               # V' = 0
    })
    assert kpss_level(df).collect() == []

"""GPD peaks-over-threshold PWM fit (operators/survival.gpd_tail):
a uniform exceedance ramp has the EXACT closed form xi = -1,
beta = (n+1)*step; too few exceedances emit nothing; degenerate
spacing yields NULL fit."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.survival import gpd_tail

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _daily(spark, values, metric="m"):
    rows = [
        ("c", metric, T0 + dt.timedelta(days=i), i, float(v))
        for i, v in enumerate(values)
    ]
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_uniform_ramp_closed_form(spark):
    # 100 days: 1..100 dollars. u = 90th smallest = 90; z = 1..10
    # dollars. A ramp is a uniform tail: xi = -1 exactly, and
    # beta = (n_e + 1) * step = 11 dollars.
    vals = [float(i + 1) for i in range(100)]
    out = gpd_tail(_daily(spark, vals)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_days, r.n_exc, r.u) == (100, 10, 90.0)
    assert r.xi == -1.0
    assert r.beta == 11.0


def test_too_few_exceedances_emits_nothing(spark):
    out = gpd_tail(_daily(spark, [float(i) for i in range(1, 31)])).collect()
    assert out == []  # 30 days -> 3 exceedances < 8


def test_exponentialish_tail_xi_near_zero(spark):
    # Geometric spacing z ~ 2^r has a heavy-ish tail: xi must come
    # out clearly above the uniform ramp's -1.
    base = [10.0] * 90
    tail = [10.0 + 2.0 ** (i / 2.0) for i in range(1, 11)]
    out = gpd_tail(_daily(spark, base + tail), tail_q=0.89).collect()
    assert len(out) == 1
    assert out[0].xi > -0.5

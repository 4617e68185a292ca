"""Indicator family (operators/indicators): Cutler RSI, Bollinger
bands, stochastic oscillator, Garman–Klass/Parkinson volatility —
hand-built fixtures with closed-form answers (monotone ⇒ RSI 100,
constant ⇒ degenerate NULLs, known OHLC ⇒ pinned GK value)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.indicators import (
    bollinger_daily,
    range_volatility,
    rsi_cutler,
    stochastic_k,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _daily(spark, values, metric="m"):
    """One observation per day ⇒ the daily cent grid IS the values."""
    rows = []
    for i, v in enumerate(values):
        ts = T0 + dt.timedelta(days=i)
        rows.append(("c", metric, ts, i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _hourly(spark, values, metric="m"):
    rows = []
    for i, v in enumerate(values):
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("c", metric, ts, i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_rsi_monotone_up_is_100(spark):
    out = rsi_cutler(
        _daily(spark, [float(i + 1) for i in range(20)])
    ).collect()
    assert len(out) == 20 - 1 - 13  # deltas=19, first full frame at 14
    assert all(r.rsi == 100.0 and r.sum_loss == 0 for r in out)


def test_rsi_flat_is_null(spark):
    out = rsi_cutler(_daily(spark, [5.0] * 20)).collect()
    assert len(out) > 0
    assert all(r.rsi is None for r in out)


def test_rsi_known_mix(spark):
    """15 days: +100 cents × 9 then −100 cents × 5 ⇒ at the last day
    the 14-delta frame holds 9 gains, 5 losses ⇒ RSI = 900/1400."""
    vals = [float(i + 1) for i in range(10)] + \
        [float(10 - (i + 1)) for i in range(5)]
    out = rsi_cutler(_daily(spark, vals)).collect()
    last = max(out, key=lambda r: r.day_ts)
    assert (last.sum_gain, last.sum_loss) == (900, 500)
    assert last.rsi == round(100.0 * 900 / 1400, 6)


def test_bollinger_constant_bands_collapse(spark):
    out = bollinger_daily(_daily(spark, [4.0] * 10)).collect()
    for r in out:
        assert r.mid == r.upper == r.lower == 4.0
        assert r.above == 0 and r.below == 0


def test_bollinger_spike_flags_above_only_at_spike(spark):
    vals = [10.0] * 9 + [50.0]
    out = sorted(bollinger_daily(_daily(spark, vals)).collect(),
                 key=lambda r: r.day_ts)
    assert [r.above for r in out] == [0, 0, 0, 1]
    assert all(r.below == 0 for r in out)


def test_stochastic_extremes(spark):
    """Monotone up: today is always the 14-day high ⇒ %K = 100; %D =
    100 once three full frames exist."""
    out = sorted(
        stochastic_k(
            _daily(spark, [float(i) for i in range(20)])
        ).collect(),
        key=lambda r: r.day_ts,
    )
    assert all(r.pct_k == 100.0 for r in out)
    assert out[0].pct_d is None and out[1].pct_d is None
    assert all(r.pct_d == 100.0 for r in out[2:])


def test_stochastic_flat_null(spark):
    out = stochastic_k(_daily(spark, [3.0] * 20)).collect()
    assert all(r.pct_k is None and r.pct_d is None for r in out)


def test_range_volatility_pinned_gk(spark):
    """24 hourly bars with known OHLC: o=100, h=400, l=50, c=200
    (values in units ⇒ cents ×100).  GK/PK from the snapped-ln
    closed form."""
    vals = [1.0] + [4.0] + [0.5] + [2.0] * 21
    out = range_volatility(_hourly(spark, vals)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.o, r.h, r.l, r.c) == (1.0, 4.0, 0.5, 2.0)
    lhl = round(math.log(400 / 50) * 1e8)
    lco = round(math.log(200 / 100) * 1e8)
    gk = 0.5 * (lhl * lhl / 1e16) - 0.3862943611198906 * (
        lco * lco / 1e16
    )
    pk = (lhl * lhl / 1e16) / 2.772588722239781
    assert r.gk_var == pytest.approx(round(gk, 6), abs=1e-9)
    assert r.pk_var == pytest.approx(round(pk, 6), abs=1e-9)


def test_range_volatility_constant_zero(spark):
    out = range_volatility(_hourly(spark, [2.0] * 24)).collect()
    r = out[0]
    assert r.gk_var == 0.0 and r.pk_var == 0.0

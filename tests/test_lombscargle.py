"""Lomb–Scargle periodogram (operators/acf.lomb_scargle): a pure
24-hour sinusoid concentrates power at period 24 (theory: P ≈ n/2 for
a pure tone) whether sampled regularly OR irregularly — the irregular
case is the operator's reason to exist; constant series ⇒ NULL power;
span gating drops periods the data cannot resolve."""

from __future__ import annotations

import datetime as dt
import math

from timeseriescorrelation_spark.operators.acf import lomb_scargle

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _sine(spark, hours, period_h=24.0, jitter=False, metric="m"):
    rows = []
    for i in range(hours):
        off = (i * i * 37) % 1800 if jitter else 0
        t_s = i * 3600 + off
        v = 10.0 + 5.0 * math.sin(2.0 * math.pi * t_s / (period_h * 3600))
        rows.append(
            ("c", metric, T0 + dt.timedelta(seconds=t_s), i, round(v, 2))
        )
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_regular_sine_peaks_at_24h(spark):
    out = lomb_scargle(_sine(spark, 240)).collect()
    pw = {r.period_h: r.power for r in out}
    # 239 h span resolves periods needing >= 2 cycles: 168 h does not.
    assert set(pw) == {6, 8, 12, 24, 48, 84}
    assert pw[24] > 0.4 * 240 / 2  # pure tone: P ~ n/2
    others = max(v for k, v in pw.items() if k != 24)
    assert pw[24] > 20 * others


def test_irregular_sine_still_peaks_at_24h(spark):
    out = lomb_scargle(_sine(spark, 240, jitter=True)).collect()
    pw = {r.period_h: r.power for r in out}
    assert pw[24] > 0.4 * 240 / 2
    others = max(v for k, v in pw.items() if k != 24)
    assert pw[24] > 10 * others


def test_constant_series_power_is_null(spark):
    rows = [
        ("c", "m", T0 + dt.timedelta(hours=i), i, 7.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = lomb_scargle(df).collect()
    assert len(out) > 0
    assert all(r.power is None for r in out)

"""Cross-spectral coherence (operators/acf.cross_coherence):
phase-locked pairs ⇒ coherence ~ 1 at the shared period even under
amplitude scaling; day-shuffled phase ⇒ low coherence; the min-days
gate drops short histories."""

from __future__ import annotations

import datetime as dt
import math

from timeseriescorrelation_spark.operators.acf import cross_coherence

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _build(spark, metric_fn_pairs, days=8):
    rows, k = [], 0
    for metric, fn in metric_fn_pairs:
        for d in range(days):
            for t in range(24):
                c = fn(d, t)
                for j in range(c):
                    ts = T0 + dt.timedelta(days=d, hours=t, seconds=j + 1)
                    rows.append(("c", metric, ts, k, 1.0))
                    k += 1
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _tone(phase_of_day):
    def fn(d, t):
        ph = phase_of_day(d)
        return 5 + round(4 * math.sin(2 * math.pi * (t - ph) / 24.0))
    return fn


def test_phase_locked_pair_coheres(spark):
    df = _build(spark, [
        ("a", _tone(lambda d: 0)),
        ("b", lambda d, t: 2 * _tone(lambda _: 0)(d, t)),  # scaled copy
    ])
    out = {r.period_h: r.coherence for r in
           cross_coherence(df).collect()}
    assert out[24] is not None and out[24] > 0.99


def test_day_shuffled_phase_decoheres(spark):
    df = _build(spark, [
        ("a", _tone(lambda d: 0)),
        ("b", _tone(lambda d: (d * 7) % 24)),  # phase jumps every day
    ])
    out = {r.period_h: r.coherence for r in
           cross_coherence(df).collect()}
    assert out[24] < 0.5


def test_min_days_gate(spark):
    df = _build(spark, [
        ("a", _tone(lambda d: 0)),
        ("b", _tone(lambda d: 0)),
    ], days=3)
    # 3 complete days < min_days=5 -> nothing emitted
    assert cross_coherence(df).collect() == []

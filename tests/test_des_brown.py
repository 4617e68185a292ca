"""Brown's double exponential smoothing: bit-equivalence against the
explicit float64 two-state recursion, and trend-sign sanity."""

from __future__ import annotations

import datetime as dt
import math

from timeseriescorrelation_spark.operators.analytics import des_brown

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _explicit(vals, alpha):
    y1 = vals[0]
    y2 = vals[0]
    out = []
    for i, x in enumerate(vals):
        if i > 0:
            y1 = (1 - alpha) * y1 + alpha * x
            y2 = (1 - alpha) * y2 + alpha * y1
        level = 2 * y1 - y2
        trend = (alpha / (1.0 - alpha)) * (y1 - y2)
        out.append(
            (math.floor(level * 1e6) / 1e6, math.floor(trend * 1e6) / 1e6)
        )
    return out


def test_des_matches_explicit_recursion_bitwise(spark):
    vals = [3.1, 4.7, 2.2, 8.8, 8.9, 1.0, 5.5, 5.5, 7.25, 0.125]
    rows = [
        ("c1", "m", T0 + dt.timedelta(minutes=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    got = sorted(
        des_brown(df, alpha=0.3).collect(), key=lambda r: r.turn_idx
    )
    want = _explicit(vals, 0.3)
    for r, (lv, tr) in zip(got, want):
        assert r.level == lv, (r.turn_idx, r.level, lv)
        assert r.trend == tr, (r.turn_idx, r.trend, tr)


def test_des_trend_sign_tracks_direction(spark):
    # strictly increasing series -> positive trend from t>=1;
    # two independent series must not bleed into each other
    rows = []
    for i in range(10):
        rows.append(("up", "m", T0 + dt.timedelta(minutes=i), i, float(i)))
        rows.append(
            ("down", "m", T0 + dt.timedelta(minutes=i), i, float(-i))
        )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    got = des_brown(df, alpha=0.3).collect()
    for r in got:
        if r.turn_idx == 0:
            assert r.trend == 0.0
        elif r.conv_id == "up":
            assert r.trend > 0
        else:
            assert r.trend < 0


def test_holt_winters_warmup_nulls_and_hand_recursion(spark):
    """First `period` rows NULL; afterwards the fitted/level/trend/
    season match a straight Python replay of the documented recursion."""
    import datetime as dt
    import math

    from timeseriescorrelation_spark.operators.analytics import (
        holt_winters,
    )

    T0 = dt.datetime(2024, 1, 1)
    m, a, b, g = 3, 0.3, 0.1, 0.2
    xs = [10.0, 12.0, 8.0, 11.0, 13.0, 7.0, 12.0, 14.0]
    rows = [("m1", T0 + dt.timedelta(hours=i), v) for i, v in enumerate(xs)]
    df = spark.createDataFrame(rows, "metric string, ts timestamp, value double")
    got = sorted(
        holt_winters(df, period=m, alpha=a, beta=b, gamma=g).collect(),
        key=lambda r: r.ts,
    )

    # replay of the docstring recursion
    seas, l, tr = [0.0], xs[0], 0.0
    want = [(None, None, None, None)]
    for t in range(1, len(xs)):
        x = xs[t]
        if t < m:
            lp = l
            l = a * x + (1.0 - a) * (lp + tr)
            tr = b * (l - lp) + (1.0 - b) * tr
            seas.append(x - l)
            want.append((None, None, None, None))
        else:
            s_old = seas[0]
            fit = l + tr + s_old
            lp, bp = l, tr
            l = a * (x - s_old) + (1.0 - a) * (lp + bp)
            tr = b * (l - lp) + (1.0 - b) * bp
            s_new = g * (x - lp - bp) + (1.0 - g) * s_old
            seas = seas[1:] + [s_new]
            want.append((fit, l, tr, s_new))

    def q(v):
        return None if v is None else math.floor(v * 1e6) / 1e6

    for r, (fit, lv, tr_, sn) in zip(got, want):
        assert (r.fitted, r.level, r.trend, r.season) == (
            q(fit), q(lv), q(tr_), q(sn)
        )

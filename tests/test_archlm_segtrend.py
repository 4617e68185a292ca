"""ARCH LM and segmented trend: hand-computed small cases."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.changepoint import (
    segmented_trend,
)
from timeseriescorrelation_spark.operators.tsdiag import arch_lm

BASE = dt.datetime(2026, 1, 1)


def _hour_series(spark, rows):
    """rows: (metric, hour_offset, value)."""
    return spark.createDataFrame(
        [
            (m, BASE + dt.timedelta(hours=h), float(v))
            for m, h, v in rows
        ],
        ["metric", "ts", "value"],
    )


def _day_series(spark, rows):
    return spark.createDataFrame(
        [
            (m, BASE + dt.timedelta(days=d), float(v))
            for m, d, v in rows
        ],
        ["metric", "ts", "value"],
    )


def _replica_arch(cents):
    dy = [b - a for a, b in zip(cents, cents[1:])]
    z = [v * v for v in dy]
    u, v = z[:-1], z[1:]
    n = len(u)
    su, sv = sum(u), sum(v)
    suv = sum(a * b for a, b in zip(u, v))
    suu = sum(a * a for a in u)
    svv = sum(b * b for b in v)
    cov = n * suv - su * sv
    vu = n * suu - su * su
    vv = n * svv - sv * sv
    if vu <= 0 or vv <= 0:
        return n, None, None
    r2 = cov * cov / (vu * vv)
    return n, r2, n * r2


def test_arch_lm_matches_replica(spark):
    # two-regime series: calm stretch (small wiggles) then wild
    # stretch (big swings) -> squared deltas autocorrelate
    vals = [100, 101, 100, 102, 101, 100, 101, 100,
            150, 60, 160, 50, 170, 40, 180, 30, 100, 101]
    rows = [("a", h, v / 100.0) for h, v in enumerate(vals)]
    r = arch_lm(_hour_series(spark, rows), min_pairs=4).collect()[0]
    n, r2, lm = _replica_arch(vals)
    assert r["n_pairs"] == n
    assert abs(r["r2"] - round(r2, 6)) < 1e-9
    assert abs(r["lm_stat"] - round(lm, 6)) < 1e-9
    assert r["r2"] > 0.2  # clustering is actually visible


def test_arch_lm_constant_deltas_null(spark):
    # perfectly linear series: every delta equal -> z constant ->
    # zero variance -> NULL statistic, row still reported
    rows = [("a", h, float(h)) for h in range(20)]
    r = arch_lm(_hour_series(spark, rows), min_pairs=4).collect()[0]
    assert r["n_pairs"] == 18
    assert r["r2"] is None and r["lm_stat"] is None


def test_segmented_trend_slopes(spark):
    # level shift + slope change at day 10: pre = 100 + 2d,
    # post = 1000 - 3d; Pettitt lands the break at the shift
    rows = []
    for d in range(10):
        rows.append(("a", d, (100 + 2 * d) / 100.0))
    for d in range(10, 20):
        rows.append(("a", d, (1000 - 3 * (d - 10)) / 100.0))
    out = segmented_trend(_day_series(spark, rows)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["change_day"] == BASE + dt.timedelta(days=9)
    assert r["n_pre"] == 10 and r["n_post"] == 10
    assert abs(r["slope_pre"] - 0.02) < 1e-9
    assert abs(r["slope_post"] - (-0.03)) < 1e-9
    assert abs(r["slope_delta"] - (-0.05)) < 1e-9


def test_segmented_trend_short_side_dropped(spark):
    # break lands so close to the edge that one side has < min_seg
    # days -> the metric disappears rather than reporting one side
    rows = [("a", d, 1.0 if d < 2 else 9.0) for d in range(10)]
    out = segmented_trend(_day_series(spark, rows), min_seg=3).collect()
    assert out == []

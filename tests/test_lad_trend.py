"""Exact LAD trend: replica argmin + robustness vs the L2 line."""

from __future__ import annotations

import datetime as dt
from fractions import Fraction

from timeseriescorrelation_spark.operators.analytics import (
    lad_trend_daily,
)

BASE = dt.datetime(2026, 1, 1)


def _series(spark, cents):
    return spark.createDataFrame(
        [
            ("a", BASE + dt.timedelta(days=d), c / 100.0)
            for d, c in enumerate(cents)
        ],
        "metric string, ts timestamp, value double",
    )


def _replica(cents):
    pts = list(enumerate(cents))
    best = None
    for ii, (xi, yi) in enumerate(pts):
        for xj, yj in pts[ii + 1:]:
            num, den = yj - yi, xj - xi
            loss_den = sum(
                abs((yk - yi) * den - num * (xk - xi)) for xk, yk in pts
            )
            lu = (loss_den * 1_000_000) // den
            key = (lu, xi, xj)
            if best is None or key < best[0]:
                best = (key, num, den, yi, xi)
    (lu, xi, xj), num, den, yi, _ = best
    slope = Fraction(num, den)
    intercept = Fraction(yi) - slope * xi
    return (
        round(float(slope) / 100.0, 6),
        round(float(intercept) / 100.0, 6),
        round(lu / 1e6 / 100.0, 6),
    )


def test_lad_matches_replica(spark):
    cents = [100, 210, 290, 1500, 420, 480, 610, 680]  # one wild day
    r = lad_trend_daily(_series(spark, cents)).collect()[0]
    slope, intercept, loss = _replica(cents)
    assert r["n_days"] == 8
    assert abs(r["slope"] - slope) < 1e-9
    assert abs(r["intercept"] - intercept) < 1e-9
    assert abs(r["lad_loss"] - loss) < 1e-9


def test_lad_ignores_single_outlier(spark):
    # perfect line + one huge outlier: LAD recovers the true line
    # exactly (loss contribution of the outlier is fixed), OLS would
    # tilt badly
    cents = [100 + 50 * d for d in range(10)]
    cents[4] = 99_999
    r = lad_trend_daily(_series(spark, cents)).collect()[0]
    assert abs(r["slope"] - 0.5) < 1e-9
    assert abs(r["intercept"] - 1.0) < 1e-9


def test_lad_exact_fit_zero_loss(spark):
    cents = [200 + 30 * d for d in range(6)]
    r = lad_trend_daily(_series(spark, cents)).collect()[0]
    assert r["lad_loss"] == 0.0
    assert abs(r["slope"] - 0.3) < 1e-9


def test_gmd_matches_pairwise_bruteforce(spark):
    from timeseriescorrelation_spark.operators.analytics import gmd_daily

    cents = [100, 250, 250, 400, 999, 50]
    rows = [
        ("a", BASE + dt.timedelta(hours=h), c / 100.0)
        for h, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    r = gmd_daily(df).collect()[0]
    n = len(cents)
    brute = sum(
        abs(a - b) for i, a in enumerate(cents) for b in cents[i + 1:]
    ) * 2 / (n * (n - 1)) / 100.0
    assert r["n"] == n
    assert abs(r["gmd"] - round(brute, 6)) < 1e-9


def test_prewhitening_kills_trend_correlation(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        xcorr_prewhitened,
    )

    # the classic spurious pair: both metrics ride the SAME strong
    # linear trend with INDEPENDENT noise.  Raw r ~ 1 (the trend is
    # the only signal that matters); after AR(1) prewhitening the
    # trend contributes only a constant, so r collapses to the
    # near-zero noise correlation.  (A deterministic SINE would NOT
    # collapse — AR(1) residuals of a sinusoid are still sinusoidal;
    # prewhitening removes the autoregressive channel, not
    # seasonality — which is why the operator reports both numbers.)
    rows = []
    for h in range(24 * 6):
        trend = 1000.0 + 10.0 * h
        na = ((h * 7919) % 13) - 6   # pseudo-noise a
        nb = ((h * 104729) % 11) - 5  # pseudo-noise b
        rows.append(("a", BASE + dt.timedelta(hours=h),
                     (trend + 3.0 * na) / 1.0))
        rows.append(("b", BASE + dt.timedelta(hours=h),
                     (trend + 3.0 * nb) / 1.0))
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    r = xcorr_prewhitened(df).collect()[0]
    assert r["r_raw"] > 0.9
    assert abs(r["r_prewhitened"]) < 0.5
    assert r["r_raw"] - abs(r["r_prewhitened"]) > 0.4


def test_tier_info_loss_extremes(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        tier_info_loss,
    )

    rows = []
    # metric "flat_within": constant inside each hour, hour means
    # differ -> rollup destroys nothing, var_retained = 1
    # metric "flat_between": every hour mean identical, wiggle ->
    # rollup destroys everything, var_retained ~ 0
    for h in range(3):
        for m in range(60):
            rows.append(("flat_within",
                         BASE + dt.timedelta(hours=h, minutes=m),
                         float(10 * (h + 1))))
            rows.append(("flat_between",
                         BASE + dt.timedelta(hours=h, minutes=m),
                         float(10 + (m % 2))))
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    got = {r["metric"]: r for r in tier_info_loss(df).collect()}
    assert got["flat_within"]["var_retained"] == 1.0
    assert got["flat_between"]["var_retained"] < 0.01


def test_isotonic_trend_pools_violations(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        isotonic_trend_daily,
    )

    # daily sums: 1, 3, 2, 5 -> PAVA pools (3,2) -> 1, 2.5, 2.5, 5
    cents = [100, 300, 200, 500]
    rows = [
        ("a", BASE + dt.timedelta(days=d), c / 100.0)
        for d, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    got = sorted(isotonic_trend_daily(df).collect(),
                 key=lambda r: r["day_ts"])
    assert [r["value_iso"] for r in got] == [1.0, 2.5, 2.5, 5.0]
    assert [r["value_raw"] for r in got] == [1.0, 3.0, 2.0, 5.0]


def test_isotonic_trend_monotone_input_unchanged(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        isotonic_trend_daily,
    )

    cents = [100, 100, 250, 400]
    rows = [
        ("a", BASE + dt.timedelta(days=d), c / 100.0)
        for d, c in enumerate(cents)
    ]
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    got = sorted(isotonic_trend_daily(df).collect(),
                 key=lambda r: r["day_ts"])
    assert all(r["value_iso"] == r["value_raw"] for r in got)

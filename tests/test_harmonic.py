"""Harmonic (daily-cycle) regression."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.acf import harmonic_regression

BASE = dt.datetime(2026, 1, 1)


def _series(spark, fn, n_hours=72, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(hours=h), float(fn(h)))
         for h in range(n_hours)],
        ["metric", "ts", "value"],
    )


def test_harmonic_recovers_pure_cosine(spark):
    # y = 100 + 50 cos(theta - phase at 6h): peak at hour 6, amp 50
    def fn(h):
        th = 2 * math.pi * (h % 24) / 24
        return 100 + 50 * math.cos(th - 2 * math.pi * 6 / 24)

    out = harmonic_regression(_series(spark, fn)).collect()[0]
    assert out["intercept"] == pytest.approx(100.0, abs=1e-2)
    assert out["amplitude"] == pytest.approx(50.0, abs=1e-2)
    assert out["phase_hour"] == pytest.approx(6.0, abs=1e-2)
    assert out["r2"] == pytest.approx(1.0, abs=1e-5)


def test_harmonic_flat_series_zero_amplitude(spark):
    out = harmonic_regression(_series(spark, lambda h: 42.0)).collect()[0]
    assert out["amplitude"] == pytest.approx(0.0, abs=1e-4)
    assert out["intercept"] == pytest.approx(42.0, abs=1e-4)
    # SST = 0 -> R² undefined
    assert out["r2"] is None


def test_harmonic_noise_has_low_r2(spark):
    # deterministic pseudo-noise with no daily structure
    def fn(h):
        return 100 + ((h * 2654435761) % 97) - 48

    out = harmonic_regression(_series(spark, fn, n_hours=240)).collect()[0]
    assert out["r2"] is not None and out["r2"] < 0.2


def test_harmonic_midnight_peak_wraps(spark):
    def fn(h):
        th = 2 * math.pi * (h % 24) / 24
        return 10 + 5 * math.cos(th)   # peak at hour 0

    out = harmonic_regression(_series(spark, fn)).collect()[0]
    ph = out["phase_hour"]
    assert min(ph, 24 - ph) < 1e-3

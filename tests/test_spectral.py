"""Spectral entropy/flatness over the periodogram."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.acf import spectral_entropy

BASE = dt.datetime(2026, 1, 1)


def _series(spark, fn, n_hours=14 * 24, metric="a"):
    rows = []
    for h in range(n_hours):
        n_ev = max(0, int(round(fn(h))))
        for i in range(n_ev):
            rows.append(
                (metric, BASE + dt.timedelta(hours=h, minutes=i), 1.0)
            )
    return spark.createDataFrame(rows, ["metric", "ts", "value"])


def test_pure_daily_tone_low_entropy(spark):
    out = spectral_entropy(
        _series(spark, lambda h: 10 + 8 * math.cos(2 * math.pi * h / 24))
    ).collect()[0]
    # one dominant band -> entropy well below the flat maximum
    assert out["spectral_entropy"] < 0.55
    assert out["spectral_flatness"] < 0.3


def test_constant_rate_is_broadbandless(spark):
    # flat series: all amps ~0; whichever tiny residues survive, the
    # operator must not crash and entropy stays defined or row drops
    rows = spectral_entropy(_series(spark, lambda h: 5)).collect()
    for r in rows:
        if r["spectral_entropy"] is not None:
            assert 0.0 <= r["spectral_entropy"] <= 1.0001
        assert 0.0 <= r["spectral_flatness"] <= 1.0001


def test_two_tones_more_entropy_than_one(spark):
    one = spectral_entropy(
        _series(spark, lambda h: 10 + 8 * math.cos(2 * math.pi * h / 24))
    ).collect()[0]["spectral_entropy"]
    two = spectral_entropy(
        _series(
            spark,
            lambda h: 10 + 4 * math.cos(2 * math.pi * h / 24)
            + 4 * math.cos(2 * math.pi * h / 12),
        )
    ).collect()[0]["spectral_entropy"]
    assert two > one

"""Tail dependence + co-burst Jaccard."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.crossmetric import (
    coburst_jaccard,
    tail_dependence,
)

BASE = dt.datetime(2026, 1, 1)


def _pair_series(spark, pairs):
    rows = []
    for d, va, vb in pairs:
        rows.append(("a", BASE + dt.timedelta(days=d), float(va)))
        rows.append(("b", BASE + dt.timedelta(days=d), float(vb)))
    return spark.createDataFrame(rows, ["metric", "ts", "value"])


def test_tail_comonotone_lambda_one(spark):
    # identical ordering: top-decile days coincide exactly
    pairs = [(d, 10 + d, 100 + 2 * d) for d in range(20)]
    out = tail_dependence(_pair_series(spark, pairs)).collect()[0]
    assert out["k_top"] == 2
    assert out["both_top"] == 2
    assert out["lambda_u"] == 1.0


def test_tail_antimonotone_lambda_zero(spark):
    pairs = [(d, 10 + d, 100 - 2 * d) for d in range(20)]
    out = tail_dependence(_pair_series(spark, pairs)).collect()[0]
    assert out["both_top"] == 0
    assert out["lambda_u"] == 0.0


def _hour_series(spark, counts_a, counts_b):
    rows = []
    for h, n in enumerate(counts_a):
        for i in range(n):
            rows.append(("a", BASE + dt.timedelta(hours=h, minutes=i),
                         1.0))
    for h, n in enumerate(counts_b):
        for i in range(n):
            rows.append(("b", BASE + dt.timedelta(hours=h, minutes=i),
                         1.0))
    return spark.createDataFrame(rows, ["metric", "ts", "value"])


def test_coburst_aligned_bursts(spark):
    base = [2] * 48
    a = list(base)
    b = list(base)
    for h in (10, 20, 30):     # shared bursts (>2x mean)
        a[h] = 30
        b[h] = 25
    a[40] = 30                  # a-only burst
    out = coburst_jaccard(_hour_series(spark, a, b)).collect()[0]
    assert out["bursts_a"] == 4 and out["bursts_b"] == 3
    assert out["both"] == 3
    assert out["jaccard"] == pytest.approx(3 / 4, abs=1e-6)


def test_coburst_disjoint_zero(spark):
    base = [2] * 48
    a = list(base)
    b = list(base)
    a[5] = 40
    b[25] = 40
    out = coburst_jaccard(_hour_series(spark, a, b)).collect()[0]
    assert out["both"] == 0 and out["jaccard"] == 0.0

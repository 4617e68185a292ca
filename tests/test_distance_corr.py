"""Distance correlation — the dependence measure Pearson can't fake."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.crossmetric import (
    corr_matrix_daily,
    distance_corr,
)

BASE = dt.datetime(2026, 1, 1)


def _series(spark, pairs):
    """pairs: list of (day, value_a, value_b)."""
    rows = []
    for d, va, vb in pairs:
        rows.append(("a", BASE + dt.timedelta(days=d), float(va)))
        rows.append(("b", BASE + dt.timedelta(days=d), float(vb)))
    return spark.createDataFrame(rows, ["metric", "ts", "value"])


def test_dcor_linear_is_one(spark):
    pairs = [(d, 10 + d, 30 + 2 * d) for d in range(14)]
    out = distance_corr(_series(spark, pairs)).collect()[0]
    assert out["dcor"] == pytest.approx(1.0, abs=1e-4)


def test_dcor_detects_v_shape_pearson_misses(spark):
    # y = |x - 6.5|: Pearson ~ 0, dCor clearly > 0
    pairs = [(d, d, abs(d - 6.5)) for d in range(14)]
    s = _series(spark, pairs)
    d = distance_corr(s).collect()[0]
    assert d["dcor"] > 0.3
    r = corr_matrix_daily(s).collect()
    if r:
        assert abs(r[0]["r"]) < 0.2


def test_dcor_constant_series_null(spark):
    pairs = [(d, 5.0, 10 + d) for d in range(12)]
    out = distance_corr(_series(spark, pairs)).collect()[0]
    # metric a has zero distance variance -> undefined
    assert out["dcor2"] is None


def test_dcor_bounded(spark):
    pairs = [(d, (d * 7) % 5, (d * 3) % 7) for d in range(20)]
    out = distance_corr(_series(spark, pairs)).collect()[0]
    assert 0.0 <= out["dcor2"] <= 1.0001
    assert 0.0 <= out["dcor"] <= 1.0001

"""Hour-of-day quantile bands."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.acf import hod_quantile_bands

BASE = dt.datetime(2026, 1, 1)


def _series(spark, day_hour_vals, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(days=d, hours=h), float(v))
         for d, h, v in day_hour_vals],
        ["metric", "ts", "value"],
    )


def test_hod_bands_exact_order_statistics(spark):
    # hour 9 across 10 days: values 1..10 -> p10 = 1st, p50 = 5th,
    # p90 = 9th order statistic (ceil indices 1, 5, 9)
    rows = [(d, 9, float(d + 1)) for d in range(10)]
    out = hod_quantile_bands(_series(spark, rows)).collect()[0]
    assert out["hod"] == 9 and out["n_days"] == 10
    assert out["p10"] == 1.0
    assert out["p50"] == 5.0
    assert out["p90"] == 9.0


def test_hod_bands_ordering_invariant(spark):
    rows = []
    for d in range(8):
        for h in (3, 15):
            rows.append((d, h, 10.0 * (h + 1) + d))
    out = {r["hod"]: r for r in hod_quantile_bands(_series(spark, rows)).collect()}
    for r in out.values():
        assert r["p10"] <= r["p50"] <= r["p90"]
    # the 15:00 band sits wholly above the 03:00 band
    assert out[15]["p10"] > out[3]["p90"]


def test_hod_bands_min_days_filter(spark):
    rows = [(d, 6, 5.0) for d in range(3)]   # only 3 days -> filtered
    assert hod_quantile_bands(_series(spark, rows)).collect() == []

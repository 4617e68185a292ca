"""Retention policy: trailing-window keep per tier, None = unbounded,
report accounting consistent with apply_retention."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.retention import (
    apply_retention,
    retention_report,
)

T0 = dt.datetime(2024, 1, 1)


def _tier(spark, days):
    rows = [
        ("c", "m", T0 + dt.timedelta(days=d), d) for d in range(days)
    ]
    return spark.createDataFrame(
        rows, "conv_id string, metric string, bucket_ts timestamp, d int"
    )


def test_apply_retention_trailing_window(spark):
    t = _tier(spark, 30)
    now = t.agg(F.max("bucket_ts").alias("_now"))  # day 29
    kept = {r.d for r in apply_retention(t, now, 7 * 86400).collect()}
    assert kept == set(range(22, 30))  # bucket >= now - 7d (inclusive)
    assert apply_retention(t, now, None).count() == 30


def test_retention_report_accounting(spark):
    t = _tier(spark, 30)
    now = t.agg(F.max("bucket_ts").alias("_now"))
    rep = {
        r.tier: (r.kept_rows, r.dropped_rows, r.oldest_kept)
        for r in retention_report(
            {"a": t, "b": t}, now, {"a": 7 * 86400, "b": None}
        ).collect()
    }
    assert rep["a"] == (8, 22, T0 + dt.timedelta(days=22))
    assert rep["b"] == (30, 0, T0)

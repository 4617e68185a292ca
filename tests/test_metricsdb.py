"""Metrics-db surface: reset-aware counter increase + histogram
quantile interpolation, hand-computed."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.metricsdb import (
    counter_increase,
    histogram_quantile_est,
)

T0 = dt.datetime(2026, 5, 4)


def _counters(spark, rows):
    """rows: (hour_offset, cnt) for one metric."""
    return spark.createDataFrame(
        [("m", T0 + dt.timedelta(hours=h), int(c)) for h, c in rows],
        "metric string, ts timestamp, cnt long",
    )


def test_counter_increase_heals_resets(spark):
    rows = [
        (0, 10), (1, 25), (2, 40),      # day 1: +15 +15 (first = 0)
        (24, 5), (25, 12),              # day 2: reset -> 5, then +7
        (48, 100), (49, 90), (50, 95),  # day 3: +? reset -> 90, +5
    ]
    out = {r["bucket_ts"]: r
           for r in counter_increase(_counters(spark, rows)).collect()}
    d1 = out[T0]
    d2 = out[T0 + dt.timedelta(days=1)]
    d3 = out[T0 + dt.timedelta(days=2)]
    assert (d1["increase"], d1["n_resets"]) == (30, 0)
    assert (d2["increase"], d2["n_resets"]) == (12, 1)
    # day 3 first sample: 100 - 12 = +88 (no reset seen), then the
    # drop to 90 books 90 (restart convention), then +5
    assert (d3["increase"], d3["n_resets"]) == (88 + 90 + 5, 1)


def test_counter_increase_first_sample_no_baseline(spark):
    out = counter_increase(_counters(spark, [(0, 1000)])).collect()[0]
    assert out["increase"] == 0 and out["n_samples"] == 1


def _series(spark, values):
    return spark.createDataFrame(
        [
            ("m", T0 + dt.timedelta(minutes=i), float(v))
            for i, v in enumerate(values)
        ],
        "metric string, ts timestamp, value double",
    )


def test_histogram_p95_interpolates(spark):
    # edges (cents): 1000, 2000; 20 values: 19 in [0,10) bucket 0,
    # 1 in bucket 1 -> p95 target pos = 19 falls exactly at the end
    # of bucket 0: 100*19 >= 95*20 -> bucket 0 wins;
    # est = 0 + (10-0)*(19-0)/19 = 10.0? in value units: edges are
    # cents; answer = lo + (hi-lo)*(0.95*20 - 0)/19 = 10*19/19 = 10
    vals = [5.0] * 19 + [15.0]
    out = histogram_quantile_est(
        _series(spark, vals), [1000, 2000], q_pct=95
    ).collect()[0]
    assert out["n"] == 20
    assert abs(out["p95_est"] - 10.0) < 1e-6


def test_histogram_p95_open_top_bucket_reports_lower_edge(spark):
    # everything beyond the last edge -> top bucket -> lower edge
    vals = [50.0] * 10
    out = histogram_quantile_est(
        _series(spark, vals), [1000, 2000], q_pct=95
    ).collect()[0]
    assert out["p95_est"] == 20.0

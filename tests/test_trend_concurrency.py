"""Round-2 extensions: Spearman pair correlation, daily OLS trend,
sweep-line concurrency — hand-built fixtures with the decisive edges
(nonlinear-but-monotone pair, exact known slope, spans crossing the
day-shard boundary)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import (
    spearman_hourly_pairs,
    trend_daily,
)
from timeseriescorrelation_spark.operators.intervals import (
    concurrency_levels,
    max_concurrency,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def test_spearman_perfect_monotone_nonlinear(spark):
    # vb = va**3 is monotone -> Spearman exactly 1.0 even though the
    # relation is nonlinear (Pearson would be < 1)
    rows = []
    for i in range(15):
        ts = T0 + dt.timedelta(hours=i)
        va = float(i + 1)
        rows.append(("a", "m", ts, i, va))
        rows.append(("b", "m", ts, i, va ** 3))
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = spearman_hourly_pairs(df, min_n=12).collect()
    assert len(r) == 1
    assert r[0].ua == "a" and r[0].ub == "b"
    assert r[0].rho_s == 1.0 and r[0].n == 15


def test_spearman_tie_ranks_average(spark):
    # series a has a 3-way tie; average ranks keep |rho| < 1 and the
    # result must match scipy-free hand math:
    # va = [1, 2, 2, 2, 3], vb = [1, 2, 3, 4, 5] over 12+ hours padded
    vas = [1.0, 2.0, 2.0, 2.0, 3.0] + [float(10 + i) for i in range(8)]
    vbs = [1.0, 2.0, 3.0, 4.0, 5.0] + [float(10 + i) for i in range(8)]
    rows = []
    for i, (va, vb) in enumerate(zip(vas, vbs)):
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("a", "m", ts, i, va))
        rows.append(("b", "m", ts, i, vb))
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = spearman_hourly_pairs(df, min_n=12).collect()
    assert len(r) == 1
    # hand-check against numpy rank math
    import numpy as np

    def avg_ranks(v):
        v = np.asarray(v)
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), dtype=float)
        i = 0
        sv = v[order]
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i:j + 1]] = (i + j) / 2 + 1
            i = j + 1
        return ranks

    ra, rb = avg_ranks(vas), avg_ranks(vbs)
    expect = np.corrcoef(ra, rb)[0, 1]
    assert abs(r[0].rho_s - round(float(expect), 6)) < 1e-9


def test_trend_daily_exact_known_slope(spark):
    # value = 0.02 * x + 5 (x = seconds into the day)
    # -> slope 0.02/sec = 72.0/hour, intercept 5.0, both exact
    rows = [
        ("c1", "m", T0 + dt.timedelta(seconds=x), i, 0.02 * x + 5.0)
        for i, x in enumerate([0, 600, 1200, 3600, 7200, 40000])
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = trend_daily(df, keys=["metric"]).collect()
    assert len(r) == 1
    assert r[0].slope_per_hour == 72.0
    assert r[0].intercept_v == 5.0
    assert r[0].n == 6


def test_trend_daily_constant_x_guarded(spark):
    # all points at the same second -> zero denominator -> NULL slope
    rows = [("c1", "m", T0, i, float(i)) for i in range(5)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = trend_daily(df, keys=["metric"]).collect()
    assert len(r) == 1
    assert r[0].slope_per_hour is None and r[0].intercept_v is None


SPAN_SCHEMA = "start_ts timestamp, end_ts timestamp"


def _span(s_min, e_min):
    return (
        T0 + dt.timedelta(minutes=s_min),
        T0 + dt.timedelta(minutes=e_min),
    )


def test_concurrency_peak_and_inclusive_end(spark):
    # three spans: [0,10], [5,15], [10,20] minutes.
    # at t=10min all three are active (ends are INCLUSIVE) -> peak 3
    df = spark.createDataFrame(
        [_span(0, 10), _span(5, 15), _span(10, 20)], SPAN_SCHEMA
    )
    lv = {r.ts: r.level for r in concurrency_levels(df).collect()}
    assert lv[T0 + dt.timedelta(minutes=10)] == 3
    mc = max_concurrency(df, trunc="hour").collect()
    assert len(mc) == 1 and mc[0].peak == 3


def test_concurrency_carry_across_day_shard(spark):
    # span A covers the whole of day 1 into day 2; day 2's local
    # running sum alone would start at 0 — the carry-in must lift it.
    a = (T0, T0 + dt.timedelta(days=1, hours=2))
    b = (
        T0 + dt.timedelta(days=1, hours=1),
        T0 + dt.timedelta(days=1, hours=1, minutes=30),
    )
    df = spark.createDataFrame([a, b], SPAN_SCHEMA)
    lv = {r.ts: r.level for r in concurrency_levels(df).collect()}
    # b's start is on day 2 while a is still open -> level 2
    assert lv[T0 + dt.timedelta(days=1, hours=1)] == 2
    # after both close the level returns to 0
    end_a = T0 + dt.timedelta(days=1, hours=2, microseconds=1)
    assert lv[end_a] == 0


def test_concurrency_matches_naive_global_cumsum(spark, tiny_series):
    """Day-sharded running sum == single global cumsum (pandas)."""
    from timeseriescorrelation_spark.streaming.rollup_stream import sessionize

    spans = sessionize(
        tiny_series.select("conv_id", "ts"), "30 minutes"
    ).select(
        F.col("session_start").alias("start_ts"),
        F.col("session_end_ts").alias("end_ts"),
    )
    got = (
        concurrency_levels(spans)
        .orderBy("ts")
        .toPandas()
    )
    sp = spans.toPandas()
    import pandas as pd

    d = pd.concat(
        [
            pd.DataFrame({"ts_us": sp.start_ts.astype("datetime64[us]").astype("int64"), "d": 1}),
            pd.DataFrame({"ts_us": sp.end_ts.astype("datetime64[us]").astype("int64") + 1, "d": -1}),
        ]
    )
    naive = (
        d.groupby("ts_us")["d"].sum().sort_index().cumsum().reset_index()
    )
    assert len(got) == len(naive)
    got_us = got.ts.astype("datetime64[us]").astype("int64").to_numpy()
    assert (got_us == naive.ts_us.to_numpy()).all()
    assert (got.level.to_numpy() == naive.d.to_numpy()).all()

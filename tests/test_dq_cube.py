"""Round-2 extensions: cross-tier consistency report, MAD outliers,
CUBE grouping sets — hand-built fixtures with the decisive edges
(an inconsistency that MUST be detected, an outlier that stddev-based
scoring would miss, subtotal-NULL vs data-NULL)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import mad_outliers
from timeseriescorrelation_spark.operators.rollup import (
    rollup_raw,
    rollup_tier,
    tier_consistency_report,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _rows(offsets_vals, conv="c1", metric="m"):
    return [
        (conv, metric, T0 + dt.timedelta(seconds=s), i, float(v))
        for i, (s, v) in enumerate(offsets_vals)
    ]


def test_tier_consistency_clean_pipeline_is_all_zeros(spark):
    data = _rows([(0, 1.0), (70, 2.0), (3700, 3.0), (7300, 4.0)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    r = tier_consistency_report(df, "1m", "1h").collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_buckets == 3  # hours 12, 13, 14
    for c in (
        "n_only_reagg", "n_only_direct", "n_cnt_diff", "n_sum_diff",
        "n_min_diff", "n_max_diff", "n_first_diff", "n_last_diff",
    ):
        assert row[c] == 0, c


def test_tier_consistency_detects_an_injected_drift(spark):
    """A corrupted low tier (one bucket's cnt bumped) must surface as
    a cnt+sum mismatch in that hour — the report detects, not
    assumes."""
    data = _rows([(0, 1.0), (70, 2.0), (3700, 3.0)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    t1m = rollup_raw(df, "1m").withColumn(
        "cnt",
        F.when(
            (F.minute("bucket_ts") == 1) & (F.hour("bucket_ts") == 12),
            F.col("cnt") + 1,
        ).otherwise(F.col("cnt")),
    )
    reagg = rollup_tier(t1m, "1h")
    direct = rollup_raw(df, "1h")
    # same diff the operator runs, but on the corrupted tier
    keys = ["conv_id", "metric", "bucket_ts"]
    j = reagg.select(*keys, F.col("cnt").alias("a_cnt")).join(
        direct.select(*keys, F.col("cnt").alias("b_cnt")), keys
    )
    bad = j.where(F.col("a_cnt") != F.col("b_cnt")).collect()
    assert len(bad) == 1 and bad[0].a_cnt == bad[0].b_cnt + 1


def test_mad_outliers_robust_to_the_outlier_itself(spark):
    # 20 points alternating 9.5/10.5, one spike at 1000.  n=21 so the
    # median is the 11th order stat = 10.5, deviations are [0]*10 +
    # [1.0]*10 + [989.5] with median 1.0 — the spike is the only point
    # beyond 3*MAD, and it could not inflate the MAD that catches it
    # (a stddev threshold here would be ~216, flagging nothing else
    # but only because the spike dominates; with two spikes stddev
    # starts missing them while MAD does not).
    vals = [9.5 if i % 2 == 0 else 10.5 for i in range(20)] + [1000.0]
    data = _rows([(i * 60, v) for i, v in enumerate(vals)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    out = mad_outliers(df, k=3.0, keys=["metric"]).collect()
    assert len(out) == 1
    assert out[0].value == 1000.0
    assert out[0].med == 10.5 and out[0].mad == 1.0
    assert out[0].score == 989.5


def test_mad_outliers_zero_mad_group_flags_any_deviation(spark):
    # constant series -> MAD == 0 -> any different point is an outlier
    # (dev > 0 = k*0), score NULL-guarded
    vals = [5.0] * 10 + [5.01]
    data = _rows([(i * 60, v) for i, v in enumerate(vals)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    out = mad_outliers(df, k=3.0, keys=["metric"]).collect()
    assert len(out) == 1
    assert out[0].value == 5.01 and out[0].score is None


def test_cube_gid_disambiguates_subtotals(spark):
    data = [
        ("a", 1, 100),
        ("a", 2, 200),
        ("b", 1, 300),
    ]
    df = spark.createDataFrame(data, "event_type string, dow int, cents long")
    r = (
        df.cube("event_type", "dow")
        .agg(
            F.grouping_id().alias("gid"),
            F.count("*").alias("n"),
            F.sum("cents").alias("sum_cents"),
        )
        .collect()
    )
    by_key = {(row.event_type, row.dow): row for row in r}
    # grand total: both rolled up -> gid 3
    gt = by_key[(None, None)]
    assert gt.gid == 3 and gt.n == 3 and gt.sum_cents == 600
    # per-event_type subtotal: dow rolled up -> gid 1 (dow is LSB)
    a_tot = by_key[("a", None)]
    assert a_tot.gid == 1 and a_tot.n == 2 and a_tot.sum_cents == 300
    # per-dow subtotal: event_type rolled up -> gid 2
    d1 = by_key[(None, 1)]
    assert d1.gid == 2 and d1.n == 2 and d1.sum_cents == 400
    # leaf rows: gid 0
    assert by_key[("b", 1)].gid == 0


def test_stl_anomaly_flags_injected_spike(spark):
    """Three weeks of a flat value with one huge spike hour: after
    trend/seasonal removal the spike must be the ONLY flagged hour,
    on the 'high' side."""
    import datetime as dt

    from timeseriescorrelation_spark.operators.decompose import (
        stl_anomaly,
    )

    base = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(21 * 24):
        v = 10.0
        if h == 250:
            v = 500.0
        rows.append(
            ("c", "m", base + dt.timedelta(hours=h), h, v)
        )
    s = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    got = stl_anomaly(s).collect()
    spike_ts = base + dt.timedelta(hours=250)
    high = [r for r in got if r.side == "high"]
    assert [r.bucket_ts for r in high] == [spike_ts]
    # the spike inflates its own (dow, hour) seasonal cell, so the
    # SIBLING weeks of that cell go strongly negative — expected for
    # a mean-based profile; every other flagged row must be one of
    # those siblings on the 'low' side
    for r in got:
        if r.side == "low":
            assert r.bucket_ts.hour == spike_ts.hour
            assert r.bucket_ts.weekday() == spike_ts.weekday()
            assert r.bucket_ts != spike_ts

"""Segment-bounded gap-fill: grid-size bound, equivalence with the
unbounded fill inside segments, and no carry across dormant gaps."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.gapfill import (
    collapse_last_wins,
    fill_locf,
)


@pytest.fixture(scope="module")
def gappy(spark):
    """One conv: active 10:00-10:03, dormant ~2h, active 12:00-12:01."""
    rows = [
        ("c0", "m", "2025-01-01 10:00:10", 0, 1.0),
        ("c0", "m", "2025-01-01 10:03:20", 1, 2.0),
        ("c0", "m", "2025-01-01 12:00:05", 2, 3.0),
        ("c0", "m", "2025-01-01 12:01:40", 3, 4.0),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts string, turn_idx int, "
              "value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    return df.cache()


def test_bounded_grid_skips_dormancy(spark, gappy):
    got = {
        (str(r.grid_ts), r.value, r.filled)
        for r in fill_locf(gappy, "1m", max_gap_steps=10).collect()
    }
    minutes = sorted(t for t, _, _ in got)
    # segment 1: 10:00..10:03 (4 rows), segment 2: 12:00..12:01 (2 rows)
    assert len(got) == 6, sorted(got)
    assert minutes[0].startswith("2025-01-01 10:00")
    assert minutes[3].startswith("2025-01-01 10:03")
    assert minutes[4].startswith("2025-01-01 12:00")
    # no 10:04..11:59 rows: dormancy not filled
    assert not any(t.startswith("2025-01-01 11:") for t in minutes)
    # LOCF inside segment 1: 10:01 and 10:02 carry value 1.0
    carried = {t: (v, f) for t, v, f in got}
    assert carried["2025-01-01 10:01:00"] == (1.0, True)
    assert carried["2025-01-01 10:02:00"] == (1.0, True)


def test_bounded_equals_unbounded_when_gap_large(spark, gappy):
    a = sorted(
        (str(r.grid_ts), r.value, r.filled)
        for r in fill_locf(gappy, "1m", max_gap_steps=10_000).collect()
    )
    b = sorted(
        (str(r.grid_ts), r.value, r.filled)
        for r in fill_locf(gappy, "1m").collect()
    )
    assert a == b


def test_bounded_grid_row_bound(spark, tiny_series):
    """grid rows <= obs buckets * (max_gap_steps + 1) by construction."""
    k = 5
    obs_n = collapse_last_wins(tiny_series, "1m").count()
    grid_n = fill_locf(tiny_series, "1m", max_gap_steps=k).count()
    unbounded_n = fill_locf(tiny_series, "1m").count()
    assert grid_n <= obs_n * (k + 1)
    assert grid_n <= unbounded_n

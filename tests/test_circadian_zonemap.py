"""Circular time-of-day stats + parquet zone-map prunability report."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.acf import circadian_phase
from timeseriescorrelation_spark.sources.layout import zone_map_report

BASE = dt.datetime(2026, 1, 1)


def _series(spark, hours, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(days=i, hours=int(h % 24),
                                      minutes=int((h % 1) * 60)), 1.0)
         for i, h in enumerate(hours)],
        ["metric", "ts", "value"],
    )


def test_circadian_concentrated_at_one_hour(spark):
    out = circadian_phase(_series(spark, [6.0] * 10)).collect()[0]
    assert out["resultant_r"] == pytest.approx(1.0, abs=1e-5)
    assert out["mean_hour"] == pytest.approx(6.0, abs=1e-4)


def test_circadian_uniform_is_zero(spark):
    # 24 events, one per hour: phasors cancel
    out = circadian_phase(_series(spark, [float(h) for h in range(24)])
                          ).collect()[0]
    assert out["resultant_r"] == pytest.approx(0.0, abs=1e-5)


def test_circadian_midnight_wrap(spark):
    # 23:30 and 00:30 -> circular mean is midnight (0h), never noon
    out = circadian_phase(_series(spark, [23.5, 0.5] * 5)).collect()[0]
    mh = out["mean_hour"]
    assert min(mh, 24.0 - mh) < 0.01
    assert out["resultant_r"] > 0.9


def test_zone_map_sorted_vs_shuffled(spark, tmp_path):
    n = 20_000
    df = spark.range(n).select(
        F.col("id").alias("k"),
        (F.col("id") * 2654435761 % 1000003).alias("noise"),
    )
    sorted_path = str(tmp_path / "sorted")
    random_path = str(tmp_path / "random")
    df.repartitionByRange(8, "k").sortWithinPartitions("k") \
        .write.mode("overwrite").parquet(sorted_path)
    df.repartition(8, "noise").write.mode("overwrite") \
        .parquet(random_path)
    s = zone_map_report(spark, sorted_path, "k").collect()[0]
    r = zone_map_report(spark, random_path, "k").collect()[0]
    assert s["n_row_groups"] >= 8
    # sorted ranges are disjoint -> no overlap, tiny point-hit cost
    assert s["avg_overlap_frac"] == 0.0
    assert s["point_hit_frac"] < 0.25
    # hash-shuffled ranges all span the domain -> everything overlaps
    assert r["avg_overlap_frac"] > 0.9
    assert r["point_hit_frac"] > 0.9


def test_zone_map_empty_dir(spark, tmp_path):
    out = zone_map_report(spark, str(tmp_path), "k").collect()[0]
    assert out["n_row_groups"] == 0
    assert out["avg_overlap_frac"] is None

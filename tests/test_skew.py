"""Skew operators: salted repartition balance + two-phase stats
equivalence with the direct aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.skew import (
    salted_repartition,
    stats_two_phase,
    with_salt,
)


def test_two_phase_equals_direct(spark, tiny_series):
    got = {
        (r.conv_id, r.metric): (r.cnt, r.sum_v, r.avg_v, r.std_v,
                                r.min_v, r.max_v)
        for r in stats_two_phase(tiny_series, buckets=8).collect()
    }
    direct = tiny_series.groupBy("conv_id", "metric").agg(
        F.count("value").alias("cnt"),
        F.round(F.sum("value"), 6).alias("sum_v"),
        F.round(F.avg("value"), 6).alias("avg_v"),
        F.min("value").alias("min_v"),
        F.max("value").alias("max_v"),
        F.sum(F.col("value") * F.col("value")).alias("s2"),
    )
    for r in direct.collect():
        mean = r.sum_v / r.cnt if r.cnt else 0.0
        var = max(r.s2 / r.cnt - (r.sum_v / r.cnt) ** 2, 0.0)
        g = got[(r.conv_id, r.metric)]
        assert g[0] == r.cnt
        assert abs(g[1] - r.sum_v) < 1e-5
        assert abs(g[2] - round(mean, 6)) < 1e-5
        assert abs(g[3] - var ** 0.5) < 1e-4
        assert g[4] == r.min_v and g[5] == r.max_v


def test_salted_repartition_spreads_heavy_key(spark, tiny_transcripts):
    """A heavy conversation must land on multiple partitions after
    salted repartition, and on exactly one without."""
    heavy = (
        tiny_transcripts.groupBy("conv_id").count()
        .orderBy(F.desc("count")).first()
    )
    df = tiny_transcripts.where(F.col("conv_id") == heavy.conv_id)
    assert heavy["count"] > 64

    def n_parts_used(d):
        return (
            d.withColumn("p", F.spark_partition_id())
            .select("p").distinct().count()
        )

    plain = df.repartition(16, "conv_id")
    salted = salted_repartition(df, 16, buckets=16)
    assert n_parts_used(plain) == 1
    assert n_parts_used(salted) >= 4


def test_salt_deterministic_and_bounded(spark, tiny_transcripts):
    s = with_salt(tiny_transcripts, buckets=8)
    r = s.agg(F.min("salt"), F.max("salt")).first()
    assert r[0] >= 0 and r[1] <= 7
    a = sorted(x.salt for x in s.where(F.col("turn_idx") < 5).collect())
    b = sorted(
        x.salt for x in with_salt(tiny_transcripts, buckets=8)
        .where(F.col("turn_idx") < 5).collect()
    )
    assert a == b

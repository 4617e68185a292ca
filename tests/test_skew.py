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


def test_key_skew_report_hand_computed(spark):
    import datetime as dt

    from timeseriescorrelation_spark.operators.skew import key_skew_report

    base = dt.datetime(2024, 1, 1)
    # per-key counts in metric m: a=1, b=1, c=2, d=4
    rows = []
    for conv, cnt in [("a", 1), ("b", 1), ("c", 2), ("d", 4)]:
        for k in range(cnt):
            rows.append((conv, "m", base + dt.timedelta(minutes=k), k, 1.0))
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = key_skew_report(df).collect()
    assert len(out) == 1
    r = out[0]
    # sorted x=[1,1,2,4]: sum(i*x)=25, num=2*25-5*8=10, den=4*8=32
    assert r.n_keys == 4 and r.n_rows == 8
    assert r.gini_u == 312500           # floor(1e6 * 10/32)
    assert r.top1_share_u == 500000     # 4/8


def test_key_skew_report_uniform_is_zero(spark):
    import datetime as dt

    from timeseriescorrelation_spark.operators.skew import key_skew_report

    base = dt.datetime(2024, 1, 1)
    rows = [
        (str(c), "m", base + dt.timedelta(minutes=k), k, 1.0)
        for c in range(5) for k in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    r = key_skew_report(df).collect()[0]
    assert r.gini_u == 0 and r.top1_share_u == 200000


def _mk_series(spark, heavy_rows: int, light_rows: int, n_light: int):
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(heavy_rows):
        rows.append(("conv_heavy", "m", base + dt.timedelta(seconds=i),
                     i, float(i % 7)))
    for c in range(n_light):
        for i in range(light_rows):
            rows.append((f"conv_{c:03d}", "m",
                         base + dt.timedelta(seconds=17 * i + c), i,
                         float((i + c) % 5)))
    return spark.createDataFrame(
        rows,
        "conv_id string, metric string, ts timestamp, "
        "turn_idx int, value double",
    )


def test_cascade_auto_salts_on_skew_only(spark):
    """VERDICT r02 #6: the measured guard — a 1-conv-dominates
    synthetic triggers the salted plan, an even synthetic keeps the
    fused single-shuffle plan, and BOTH paths produce identical
    tiers."""
    from timeseriescorrelation_spark.operators.rollup import (
        rollup_cascade_auto,
        rollup_cascade_fused,
    )

    def tiers_sorted(tiers):
        out = {}
        for k, df in tiers.items():
            pdf = df.toPandas()
            pdf["sum"] = pdf["sum"].round(6)
            out[k] = pdf.sort_values(
                ["conv_id", "metric", "bucket_ts"]
            ).reset_index(drop=True)
        return out

    skewed = _mk_series(spark, heavy_rows=4000, light_rows=25, n_light=40)
    st: dict = {}
    got = tiers_sorted(rollup_cascade_auto(skewed, stats=st))
    assert st["salted"] is True, st
    want = tiers_sorted(rollup_cascade_fused(skewed))
    for k in ("1m", "1h", "1d"):
        import pandas.testing as pdt

        pdt.assert_frame_equal(got[k], want[k])

    even = _mk_series(spark, heavy_rows=25, light_rows=25, n_light=40)
    st2: dict = {}
    got2 = tiers_sorted(rollup_cascade_auto(even, stats=st2))
    assert st2["salted"] is False, st2
    want2 = tiers_sorted(rollup_cascade_fused(even))
    for k in ("1m", "1h", "1d"):
        import pandas.testing as pdt

        pdt.assert_frame_equal(got2[k], want2[k])

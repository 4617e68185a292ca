"""Streaming lateness must aggregate to the batch lateness_audit —
running max crosses the micro-batch boundary via state."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.dq import lateness_audit
from timeseriescorrelation_spark.streaming.lateness_stream import (
    stream_lateness,
)
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, "
    "value double"
)


def _rows():
    # arrival order (turn_idx) vs event minutes; late events at idx 2
    # (58 min late) and idx 5 (89 min late, ACROSS the chunk split)
    seq = [(0, 0), (1, 60), (2, 2), (3, 61),
           (4, 90), (5, 1), (6, 95)]
    return [
        ("c", "m", T0 + dt.timedelta(minutes=mm), i, 1.0)
        for i, mm in seq
    ]


def test_stream_lateness_matches_batch(spark, tmp_path):
    df = spark.createDataFrame(_rows(), SCHEMA)

    src = tmp_path / "src"
    df.where(F.col("turn_idx") < 4).coalesce(1).write.parquet(
        str(src / "chunk1")
    )
    df.where(F.col("turn_idx") >= 4).coalesce(1).write.parquet(
        str(src / "chunk2")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "*"))
    )
    out = stream_lateness(stream)
    run_available_now(out, str(tmp_path / "sink"),
                      str(tmp_path / "ckpt"))
    got = spark.read.parquet(str(tmp_path / "sink"))
    agg = got.groupBy("metric").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("late_us") > 0).cast("long")).alias("n_late"),
        F.max("late_us").alias("max_us"),
    ).collect()[0]
    batch = lateness_audit(df).collect()[0]
    assert agg["n"] == batch["n"] == 7
    assert agg["n_late"] == batch["n_late"] == 2
    assert agg["max_us"] / 1e6 == batch["max_lateness_s"] == 89 * 60.0

"""Streaming counter increments (applyInPandasWithState) must compose
to the batch counter_rate: aggregate the increment sink per hour and
compare — state carries the lag across micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import counter_rate
from timeseriescorrelation_spark.streaming.rate_stream import (
    stream_counter_increments,
)
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, "
    "value double"
)


def _rows():
    """Counter-ish series with a reset and a cross-chunk boundary at
    hour 6 (the chunk split exercises cross-batch lag state)."""
    rows = []
    for h, mins, v in [
        (0, 5, 10.0), (0, 40, 13.0),   # +3 within bucket 0
        (2, 10, 2.0),                  # reset -> clamped to 0
        (5, 59, 8.0),                  # +6 in bucket 5
        (7, 0, 9.5),                   # +1.5 ACROSS the chunk split
        (9, 30, 9.5),                  # flat -> +0 (still a delta row)
    ]:
        rows.append(
            ("c1", "m", T0 + dt.timedelta(hours=h, minutes=mins),
             h * 100 + mins, v)
        )
    for h, v in [(1, 100.0), (8, 250.0)]:  # lag spans the split
        rows.append(("c2", "m", T0 + dt.timedelta(hours=h), h, v))
    return rows


def test_streamed_increments_aggregate_to_batch_rate(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(hours=6)

    src = tmp_path / "src"
    df.where(F.col("ts") < split).coalesce(1).write.parquet(
        str(src / "chunk1")
    )
    df.where(F.col("ts") >= split).coalesce(1).write.parquet(
        str(src / "chunk2")
    )
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk*")
        .withWatermark("ts", "10 minutes")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream_counter_increments(stream), out, ckpt)

    sink_hourly = (
        spark.read.parquet(out)
        .groupBy(
            "conv_id", "metric",
            F.date_trunc("hour", "ts").alias("bucket_ts"),
        )
        .agg(
            F.count("*").alias("n_deltas"),
            F.round(F.sum("inc"), 6).alias("increase"),
            F.round(F.sum("inc") / F.lit(3600.0), 6).alias("rate_per_s"),
        )
    )
    got = sorted(map(tuple, sink_hourly.collect()))
    want = sorted(map(tuple, counter_rate(df, "hour").collect()))
    assert got == want
    # the reset bucket must be present with a zero increase
    reset = [r for r in got if r[0] == "c1" and r[2].hour == 2]
    assert reset and reset[0][4] == 0.0

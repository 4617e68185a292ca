"""Streaming fixed-reference PSI must be BIT-EQUAL to the batch
expanding form on closed hours: cumulative bin counts are exact int64
state, so any micro-batch split replays the identical per-bin
micro-snap + integer sum."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.drift import psi_fixed_hourly
from timeseriescorrelation_spark.streaming.psi_stream import stream_psi
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "metric string, ts timestamp, value double"
EDGES = [2.0, 4.0, 6.0, 8.0]  # 5 bins


def _rows():
    rows = []
    # hour 0-1 roughly uniform over the 5 bins; hours 2-4 drift hard
    # into the top bin; includes an exact edge value (4.0 -> bin 2)
    # and an exact .5-cent value (6.125)
    per_hour = [
        [1.0, 3.0, 5.0, 7.0, 9.0, 4.0],
        [1.5, 3.5, 5.5, 7.5, 9.5, 6.125],
        [9.0, 9.1, 9.2, 1.0],
        [9.3, 9.4, 9.5, 9.6],
        [9.7, 9.8],
    ]
    i = 0
    for h, vals in enumerate(per_hour):
        for v in vals:
            rows.append(("m", T0 + dt.timedelta(hours=h, minutes=i % 50),
                         float(v)))
            i += 1
    # second metric interleaved, stays uniform (low psi)
    for h in range(4):
        for v in (1.0, 3.0, 5.0, 7.0, 9.0):
            rows.append(("u", T0 + dt.timedelta(hours=h, minutes=25), v))
    return rows


def test_stream_psi_bit_equal_to_batch_closed_hours(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(hours=2, minutes=10)

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
    run_available_now(stream_psi(stream, EDGES), out, ckpt)

    got = sorted(map(tuple, spark.read.parquet(out).collect()))
    batch = psi_fixed_hourly(df, EDGES)
    # the stream never closes each metric's final hour
    last = batch.groupBy("metric").agg(F.max("hour_ts").alias("_mx"))
    want = sorted(
        map(
            tuple,
            batch.join(last, "metric")
            .where(F.col("hour_ts") < F.col("_mx"))
            .drop("_mx")
            .collect(),
        )
    )
    assert got == want  # bit-equal
    by = {(t[0], t[1].hour): t for t in got}
    # uniform metric: every bin has mass ~1/5 -> psi near 0
    assert abs(by[("u", 2)][3]) < 0.01
    # drifting metric: psi grows as the top bin swallows the mass
    assert by[("m", 3)][3] > by[("m", 1)][3]

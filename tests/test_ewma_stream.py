"""Streaming EWMA must be BIT-EQUAL to the batch operator: the
recursion depends on history only through y_{t-1}, so the carried
state replays the identical float64 sequence across micro-batch
boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import ewma
from timeseriescorrelation_spark.streaming.ewma_stream import stream_ewma
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, "
    "value double"
)


def _rows():
    rows = []
    vals = [3.1, 4.7, 2.2, 8.8, 8.9, 1.0, 5.5, 5.5, 7.25, 0.125]
    for i, v in enumerate(vals):
        rows.append(("c1", "m", T0 + dt.timedelta(hours=i), i, v))
    # second series whose points interleave across the batch split
    for i, v in enumerate([100.0, 50.0, 75.0]):
        rows.append(("c2", "m", T0 + dt.timedelta(hours=3 * i + 1), i, v))
    return rows


def test_stream_ewma_bit_equal_to_batch(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(hours=5)

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
    run_available_now(stream_ewma(stream, alpha=0.3), out, ckpt)

    got = sorted(
        map(tuple, spark.read.parquet(out).collect()),
        key=lambda t: (t[0], t[3]),
    )
    want = sorted(
        map(tuple, ewma(df, alpha=0.3).collect()),
        key=lambda t: (t[0], t[3]),
    )
    assert got == want  # bit-equal, including the ewma column
    assert len(got) == len(rows)

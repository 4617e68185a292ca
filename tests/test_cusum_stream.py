"""Streaming online CUSUM must be BIT-EQUAL to the batch fixed-
reference operator: p/min/max over integer cent deviations are exact
int64 state, so any micro-batch split replays the identical window
algebra."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import cusum_fixed
from timeseriescorrelation_spark.streaming.cusum_stream import stream_cusum
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, "
    "value double"
)
MU, SIGMA, H = 5.0, 2.0, 3.0


def _rows():
    rows = []
    # drifts upward past the threshold mid-way; includes an exact
    # .5-cent value (7.125) pinning the half-away snap
    vals = [5.0, 4.5, 5.5, 6.0, 7.0, 9.0, 9.5, 7.125, 10.0, 12.0]
    for i, v in enumerate(vals):
        rows.append(("c1", "m", T0 + dt.timedelta(hours=i), i, v))
    # downward drift on a second series, interleaved across the split
    for i, v in enumerate([5.0, 3.0, 1.0, 0.5, 0.0]):
        rows.append(("c2", "m", T0 + dt.timedelta(hours=2 * i + 1), i, v))
    return rows


def _key(t):
    return (t[0], t[3])


def test_stream_cusum_bit_equal_to_batch(spark, tmp_path):
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
    run_available_now(stream_cusum(stream, MU, SIGMA, H), out, ckpt)

    got = sorted(map(tuple, spark.read.parquet(out).collect()), key=_key)
    want = sorted(
        map(tuple, cusum_fixed(df, MU, SIGMA, H).collect()), key=_key
    )
    assert got == want  # bit-equal scores AND alert flags
    assert len(got) == len(rows)
    by = {(t[0], t[3]): t for t in got}
    # hand math: c1 cent deviations vs mu=5 cumsum to +2563 by turn 9
    # (7.125 snaps half-away to 713); low-water mark is -50, so
    # s_plus = (2563 + 50)/100 = 26.13
    assert by[("c1", 9)][5] == 26.13
    # threshold h*sigma = 6.0: c1 alerts by the end, not at the start
    assert by[("c1", 9)][7] is True
    assert by[("c1", 0)][7] is False
    # the downward series alerts on s_minus
    assert by[("c2", 4)][6] > 0 and by[("c2", 4)][7] is True

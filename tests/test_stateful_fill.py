"""Stateful streaming LOCF (applyInPandasWithState) must equal batch
fill_locf when observations arrive in bucket order — state carries the
fill across micro-batch boundaries."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.gapfill import fill_locf
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)
from timeseriescorrelation_spark.streaming.stateful_fill import (
    stream_fill_locf,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, "
    "value double"
)


def _rows():
    """Two series with in-bucket duplicates (last-wins exercised) and
    multi-hour gaps (carry exercised); split point = hour 6 boundary."""
    rows = []
    for h, mins, v in [
        (0, 5, 1.0), (0, 40, 2.0),   # duplicate bucket 0 -> last wins
        (2, 10, 3.0),                 # 2h gap -> bucket 1 carried
        (5, 59, 4.0),
        (7, 0, 5.0),                  # crosses the chunk split
        (9, 30, 6.0),
    ]:
        rows.append(
            ("c1", "m", T0 + dt.timedelta(hours=h, minutes=mins),
             h * 100 + mins, v)
        )
    for h, v in [(1, 10.0), (8, 20.0)]:  # long gap spanning the split
        rows.append(("c2", "m", T0 + dt.timedelta(hours=h), h, v))
    return rows


def test_stateful_fill_matches_batch(spark, tmp_path):
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
    run_available_now(stream_fill_locf(stream, "1h"), out, ckpt)

    got = sorted(
        (r.conv_id, r.metric, r.grid_ts, r.value, r.filled)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.conv_id, r.metric, r.grid_ts, r.value, r.filled)
        for r in fill_locf(df, "1h").collect()
    )
    assert got == want
    assert len(got) == 10 + 8  # c1 spans h0..h9, c2 spans h1..h8


def test_stateful_fill_resume_emits_nothing_new(spark, tmp_path):
    """Same checkpoint, second AvailableNow run: durable state + offsets
    mean zero re-emission (the streaming analogue of manifest resume)."""
    df = spark.createDataFrame(_rows(), SCHEMA)
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src / "all"))

    def run():
        stream = (
            spark.readStream.schema(SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/all")
            .withWatermark("ts", "10 minutes")
        )
        run_available_now(
            stream_fill_locf(stream, "1h"),
            str(tmp_path / "out"), str(tmp_path / "ckpt"),
        )
        return spark.read.parquet(str(tmp_path / "out")).count()

    n1 = run()
    n2 = run()
    assert n1 == n2 > 0

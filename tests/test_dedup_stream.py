"""Streaming ingest dedup: replayed (conv_id, turn_idx) keys across
micro-batch boundaries must be dropped by state, and the sink must
equal batch dropDuplicates over the same input."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.streaming.dedup_stream import stream_dedup
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "conv_id string, turn_idx int, ts timestamp, value double"


def test_stream_dedup_across_batches(spark, tmp_path):
    fresh = [
        ("c1", i, T0 + dt.timedelta(minutes=i), float(i)) for i in range(8)
    ]
    # replay of turns 3..6 lands in the SECOND file (second micro-batch
    # with maxFilesPerTrigger=1): intra-batch dedup can't catch these —
    # only carried state can
    replay = [fresh[i] for i in range(3, 7)]
    df1 = spark.createDataFrame(fresh[:6], SCHEMA)
    df2 = spark.createDataFrame(fresh[6:] + replay, SCHEMA)
    src = tmp_path / "src"
    df1.coalesce(1).write.parquet(str(src / "chunk1"))
    df2.coalesce(1).write.parquet(str(src / "chunk2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk*")
        .withWatermark("ts", "2 hours")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream_dedup(stream), out, ckpt)

    got = sorted(
        map(tuple, spark.read.parquet(out).drop("ts").collect())
    )
    want = sorted(
        map(
            tuple,
            spark.createDataFrame(fresh + replay, SCHEMA)
            .dropDuplicates(["conv_id", "turn_idx"])
            .drop("ts")
            .collect(),
        )
    )
    assert got == want
    assert len(got) == 8  # every turn exactly once


def test_stream_dedup_keeps_distinct_keys(spark, tmp_path):
    rows = [
        ("a", 1, T0, 1.0),
        ("a", 2, T0, 2.0),  # same ts, different turn -> both kept
        ("b", 1, T0, 3.0),  # same turn, different conv -> kept
    ]
    df = spark.createDataFrame(rows, SCHEMA)
    src = tmp_path / "src"
    df.coalesce(1).write.parquet(str(src / "chunk1"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .parquet(f"{src}/chunk*")
        .withWatermark("ts", "1 hour")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream_dedup(stream), out, ckpt)
    assert spark.read.parquet(out).count() == 3

"""Streaming 1m tier vs batch rollup equivalence + watermark eviction +
sessionization oracle."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.rollup import rollup_raw
from timeseriescorrelation_spark.streaming.rollup_stream import (
    read_series_stream,
    run_available_now,
    sessionize,
    stream_rollup_1m,
)


@pytest.fixture(scope="module")
def series_dir(spark, tiny_series, tmp_path_factory):
    d = tmp_path_factory.mktemp("series_src")
    (
        tiny_series.select("conv_id", "metric", "ts", "turn_idx", "value")
        .repartition(8, "conv_id")
        .write.mode("overwrite")
        .parquet(str(d / "parquet"))
    )
    return str(d / "parquet")


def _canon(df):
    return sorted(
        (r.conv_id, r.metric, r.bucket_ts, r.cnt, round(r.sum, 9),
         r.min, r.max, r.first, r.last)
        for r in df.collect()
    )


def test_stream_rollup_matches_batch(spark, tiny_series, series_dir,
                                     tmp_path):
    """AvailableNow streaming 1m tier (append mode) must equal the batch
    tier on every bucket finalized by the watermark, and emit nothing
    else."""
    stream = read_series_stream(spark, series_dir)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(stream_rollup_1m(stream, "10 minutes"), out, ckpt)

    got = spark.read.parquet(out)
    batch = rollup_raw(
        tiny_series.select("conv_id", "metric", "ts", "turn_idx", "value"),
        "1m",
    )
    max_ts = tiny_series.agg(F.max("ts")).collect()[0][0]
    watermark = max_ts - dt.timedelta(minutes=10)
    # windows whose END <= watermark are finalized in append mode
    closed = batch.where(
        F.col("bucket_ts") + F.expr("interval 1 minute")
        <= F.lit(watermark)
    )
    assert _canon(got) == _canon(closed)
    assert len(_canon(got)) > 0


def test_stream_resume_is_incremental(spark, tiny_series, series_dir,
                                      tmp_path):
    """Re-running AvailableNow on the same checkpoint emits nothing new
    (offsets are durable — the streaming analogue of manifest resume)."""
    stream = read_series_stream(spark, series_dir)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_available_now(stream_rollup_1m(stream), out, ckpt)
    n1 = spark.read.parquet(out).count()
    stream2 = read_series_stream(spark, series_dir)
    run_available_now(stream_rollup_1m(stream2), out, ckpt)
    n2 = spark.read.parquet(out).count()
    assert n1 == n2 > 0


def test_sessionize_matches_gaps_and_islands(spark, tiny_series):
    """session_window sessions == lag/cumsum gaps-and-islands sessions
    (new session at delta >= gap, half-open spans)."""
    from pyspark.sql import Window

    df = tiny_series.where(F.col("metric") == "token_len").select(
        "conv_id", "ts"
    )
    got = sorted(
        (r.conv_id, r.session_start, r.session_end_ts, r.n_events)
        for r in sessionize(df, "30 minutes").collect()
    )

    w = Window.partitionBy("conv_id").orderBy("ts")
    lagged = df.withColumn("prev", F.lag("ts").over(w)).withColumn(
        "new_s",
        F.when(
            F.col("prev").isNull()
            | (F.col("ts") >= F.col("prev") + F.expr("interval 30 minutes")),
            1,
        ).otherwise(0),
    )
    sid = F.sum("new_s").over(
        Window.partitionBy("conv_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    want = sorted(
        (r.conv_id, r.session_start, r.session_end_ts, r.n_events)
        for r in lagged.withColumn("sid", sid)
        .groupBy("conv_id", "sid")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end_ts"),
            F.count("*").alias("n_events"),
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0

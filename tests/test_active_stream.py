"""Streaming trailing-distinct actives: chained dedup + windowed count
must equal the batch trailing_distinct on every bucket the watermark
closed, across micro-batch boundaries (state, not intra-batch dedup,
carries actor/bucket firsts)."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.activity import (
    trailing_distinct,
)
from timeseriescorrelation_spark.streaming.active_stream import (
    stream_trailing_active,
)
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "metric string, conv_id string, ts timestamp, value double"


def test_stream_trailing_active_equals_batch_on_closed_buckets(
        spark, tmp_path):
    W = 4  # small trailing window keeps the closed-bucket set useful
    rows1 = [
        ("m", "A", T0, 1.0),
        ("m", "B", T0 + dt.timedelta(hours=1), 1.0),
    ]
    # second micro-batch: same actor re-appears (state must dedup it
    # against batch 1's coverage) + a far-future event that advances
    # the watermark past every early bucket
    rows2 = [
        ("m", "A", T0 + dt.timedelta(hours=2), 1.0),
        ("m", "C", T0 + dt.timedelta(hours=60), 1.0),
    ]
    src = tmp_path / "src"
    spark.createDataFrame(rows1, SCHEMA).coalesce(1).write.parquet(
        str(src / "c1"))
    spark.createDataFrame(rows2, SCHEMA).coalesce(1).write.parquet(
        str(src / "c2"))

    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/c*")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(
        stream_trailing_active(stream, window_hours=W, lateness_hours=1),
        out, ckpt,
    )
    got = {
        (r["metric"], r["bucket_ts"]): r["n_active"]
        for r in spark.read.parquet(out).collect()
    }
    assert got, "watermark should have closed the early buckets"

    # batch reference on the same rows, restricted to emitted buckets
    batch = trailing_distinct(
        spark.createDataFrame(rows1 + rows2, SCHEMA), window_hours=W
    )
    want = {
        (r["metric"], r["bucket_ts"]): r["n_active"]
        for r in batch.collect()
    }
    for k, v in got.items():
        assert want.get(k) == v, (k, v, want.get(k))
    # the interesting buckets actually closed: hour 1 and 2 see both
    # A and B (A's hour-0 and hour-2 activity dedup to one actor)
    assert got[("m", T0 + dt.timedelta(hours=1))] == 2
    assert got[("m", T0 + dt.timedelta(hours=2))] == 2

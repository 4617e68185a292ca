"""Exactly-once streaming publication: foreachBatch commits into the
snapshot store must dedupe replayed batch ids and survive a simulated
crash-before-checkpoint replay without duplicating rows."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.sources.snapshots import (
    snapshot_log,
    snapshot_read,
)
from timeseriescorrelation_spark.streaming.publish import (
    publish_stream,
    snapshot_publish_batch,
)

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, "
    "turn_idx int, value double"
)


def _rows(a, b):
    return [
        ("c1", "m", T0 + dt.timedelta(minutes=i), i, float(i))
        for i in range(a, b)
    ]


def test_replayed_batch_id_is_skipped(spark, tmp_path):
    t = str(tmp_path / "tbl")
    d = spark.createDataFrame(_rows(0, 5), SCHEMA)
    v1 = snapshot_publish_batch(d, 0, t)
    assert v1 == 1
    # simulated replay of the SAME micro-batch (crash after commit,
    # before the sink checkpoint recorded it)
    assert snapshot_publish_batch(d, 0, t) is None
    assert snapshot_publish_batch(d, 1, t) == 2
    got = snapshot_read(spark, t).count()
    assert got == 10  # 5 + 5, not 15
    assert [e["version"] for e in snapshot_log(spark, t)] == [1, 2]


def test_stream_publish_incremental_and_restart(spark, tmp_path):
    src = tmp_path / "src"
    t = str(tmp_path / "tier")
    ck = str(tmp_path / "ck")

    spark.createDataFrame(_rows(0, 6), SCHEMA).coalesce(1).write.parquet(
        str(src / "d1")
    )
    stream = spark.readStream.schema(SCHEMA).parquet(f"{src}/d*")
    publish_stream(stream.where(F.col("value") >= 0), t, ck)
    first = sorted(r.turn_idx for r in snapshot_read(spark, t).collect())
    assert first == list(range(6))

    # second drop + SAME checkpoint: only the new file is processed
    spark.createDataFrame(_rows(6, 9), SCHEMA).coalesce(1).write.parquet(
        str(src / "d2")
    )
    stream2 = spark.readStream.schema(SCHEMA).parquet(f"{src}/d*")
    publish_stream(stream2.where(F.col("value") >= 0), t, ck)
    second = sorted(r.turn_idx for r in snapshot_read(spark, t).collect())
    assert second == list(range(9))
    # every committed version carries its batch_id exactly once
    log = snapshot_log(spark, t)
    assert len(log) == len({e["version"] for e in log})

"""Streaming 1m→1h continuous aggregate: two incremental drains of
the silver tier produce a materialized hour tier identical to one
batch rollup of everything."""

from __future__ import annotations

import datetime as dt
import shutil
import tempfile

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.rollup import (
    rollup_raw_upsertable,
)
from timeseriescorrelation_spark.streaming.cascade_stream import (
    stream_cascade_1h,
)

T0 = dt.datetime(2026, 2, 2, 0, 0, 0)
SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, "
    "turn_idx int, value double"
)

STD = ["conv_id", "metric", "bucket_ts", "cnt", "sum", "min", "max",
       "first", "last"]


def _series_rows(minutes):
    rows = []
    for i, m in enumerate(minutes):
        rows.append(("c1", "rate", T0 + dt.timedelta(minutes=m), i,
                     float(10 + (m % 7))))
        rows.append(("c1", "rate",
                     T0 + dt.timedelta(minutes=m, seconds=30),
                     1000 + i, float(m % 5)))
    return rows


def _silver(spark, rows):
    """Batch equivalent of the streaming 1m tier: plain bucket rows."""
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    return rollup_raw_upsertable(df, "1m").drop("fkey", "lkey")


def _norm(df):
    return sorted(
        (r["conv_id"], r["metric"], r["bucket_ts"], r["cnt"],
         round(r["sum"], 6), r["min"], r["max"], r["first"], r["last"])
        for r in df.select(*STD).collect()
    )


def test_incremental_cascade_equals_batch(spark):
    work = tempfile.mkdtemp(prefix="cascade_")
    try:
        silver = f"{work}/silver"
        gold = f"{work}/gold"
        ck = f"{work}/ck"
        # chunk 1: minutes 0..89 (hours 0 and part of 1);
        # chunk 2: minutes 90..200 -- split on a minute boundary so
        # each 1m bucket lives in exactly one chunk (append-mode
        # semantics of the real silver stage)
        all_minutes = list(range(0, 201, 3))
        c1 = [m for m in all_minutes if m < 90]
        c2 = [m for m in all_minutes if m >= 90]

        _silver(spark, _series_rows(c1)).write.mode("append").parquet(
            silver
        )
        stream_cascade_1h(spark, silver, gold, ck)
        got1 = spark.read.parquet(gold)
        # after drain 1 only chunk-1 hours exist
        assert got1.agg(F.max("bucket_ts")).collect()[0][0] \
            == T0 + dt.timedelta(hours=1)

        _silver(spark, _series_rows(c2)).write.mode("append").parquet(
            silver
        )
        stream_cascade_1h(spark, silver, gold, ck)

        want = rollup_raw_upsertable(
            spark.createDataFrame(_series_rows(all_minutes),
                                  SERIES_SCHEMA),
            "1h",
        )
        assert _norm(spark.read.parquet(gold)) == _norm(want)
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cascade_second_drain_without_new_input_is_noop(spark):
    work = tempfile.mkdtemp(prefix="cascade_")
    try:
        silver = f"{work}/silver"
        gold = f"{work}/gold"
        ck = f"{work}/ck"
        rows = _series_rows(list(range(0, 60, 5)))
        _silver(spark, rows).write.mode("append").parquet(silver)
        stream_cascade_1h(spark, silver, gold, ck)
        before = _norm(spark.read.parquet(gold))
        stream_cascade_1h(spark, silver, gold, ck)  # nothing new
        assert _norm(spark.read.parquet(gold)) == before
    finally:
        shutil.rmtree(work, ignore_errors=True)


def test_cascade_late_chunk_refolds_existing_hours(spark):
    # chunks arrive OUT OF ORDER: the late chunk carries EARLIER
    # minutes, so its fold must merge into hour partitions that the
    # first drain already materialized -- the continuous-aggregate
    # late-data contract (tier_merge exactness at the storage layer)
    work = tempfile.mkdtemp(prefix="cascade_")
    try:
        silver = f"{work}/silver"
        gold = f"{work}/gold"
        ck = f"{work}/ck"
        all_minutes = list(range(0, 121, 3))
        late = [m for m in all_minutes if m % 2 == 1]   # odd minutes
        first = [m for m in all_minutes if m % 2 == 0]  # even minutes

        _silver(spark, _series_rows(first)).write.mode("append").parquet(
            silver
        )
        stream_cascade_1h(spark, silver, gold, ck)
        _silver(spark, _series_rows(late)).write.mode("append").parquet(
            silver
        )
        stream_cascade_1h(spark, silver, gold, ck)

        want = rollup_raw_upsertable(
            spark.createDataFrame(_series_rows(all_minutes),
                                  SERIES_SCHEMA),
            "1h",
        )
        assert _norm(spark.read.parquet(gold)) == _norm(want)
    finally:
        shutil.rmtree(work, ignore_errors=True)

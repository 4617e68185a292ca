"""Streaming pairwise correlation must be BIT-EQUAL to the batch
corr_matrix_daily on closed days: the per-pair state is six exact
int64 moments + the open hour's partials, so any micro-batch split
replays identical arithmetic."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.crossmetric import (
    corr_matrix_daily,
)
from timeseriescorrelation_spark.streaming.corr_stream import stream_corr
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
SCHEMA = "metric string, ts timestamp, value double"
PAIRS = [("a", "b"), ("a", "c"), ("b", "c")]


def _rows():
    rows = []
    # 3 days; a and b correlate positively, c anti-correlates with a;
    # day 2 gives pair (b, c) only 3 common hours (below min_hours=4);
    # includes a .5-cent value and hours where only one metric shows
    for d in range(3):
        for h in range(6):
            t = T0 + dt.timedelta(days=d, hours=h, minutes=7)
            base = (d * 6 + h) % 5 + 1.0
            rows.append(("a", t, base + 0.125))
            if not (d == 1 and h >= 3):
                rows.append(("b", t, 2 * base + d))
            rows.append(("c", t, 10.0 - base))
        # an hour where ONLY a shows (must not count for any pair)
        rows.append(("a", T0 + dt.timedelta(days=d, hours=9), 99.0))
    # day 3: one event so day 2 closes for every pair
    for m in ("a", "b", "c"):
        rows.append((m, T0 + dt.timedelta(days=3, hours=1), 1.0))
    return rows


def test_stream_corr_bit_equal_to_batch_closed_days(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(days=1, hours=4, minutes=30)  # mid-day-2

    src = tmp_path / "src"
    df.where(F.col("ts") < split).coalesce(1).write.parquet(
        str(src / "chunk1"))
    df.where(F.col("ts") >= split).coalesce(1).write.parquet(
        str(src / "chunk2"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk*")
        .withWatermark("ts", "10 minutes")
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(stream_corr(stream, PAIRS), out, ckpt)
    got = sorted(map(tuple, spark.read.parquet(out).collect()))

    batch = corr_matrix_daily(
        df.select("metric", "ts", "value"), key="metric"
    )
    # the stream never closes each pair's final OBSERVED day — the
    # Jan-4 sentinel events, which the n>=4 filter drops from the
    # batch output anyway, so every batch row must appear
    want = sorted(
        map(
            tuple,
            batch.where(
                F.col("day_ts") < dt.datetime(2024, 1, 4)
            ).collect(),
        )
    )
    assert got == want
    # sanity on content: day-2 (b, c) is below min_hours -> absent
    assert not any(
        r[0] == "b" and r[1] == "c"
        and r[2] == T0 + dt.timedelta(days=1) for r in got
    )
    # planted structure: (a, b) strongly positive, (a, c) == -1 on
    # day 1 (exact affine anti-correlation)
    d0 = {(r[0], r[1]): r[4] for r in got if r[2] == T0}
    assert d0[("a", "b")] > 0.99
    assert d0[("a", "c")] == -1.0

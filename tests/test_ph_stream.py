"""Streaming online Page-Hinkley: the integer fixed-point recursion
must be split-invariant (same scores whether the input arrives as one
micro-batch or several) and must match the pure-Python reference
recursion exactly."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from timeseriescorrelation_spark.streaming.ph_stream import (
    reference_page_hinkley,
    stream_page_hinkley,
)
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
    # c1: stationary 10 hours then a +8 level shift for 10 -> drifts
    vals = [5.0, 5.2, 4.8, 5.1, 4.9, 5.0, 5.3, 4.7, 5.0, 5.1] + [
        13.0, 12.8, 13.2, 13.1, 12.9, 13.0, 13.3, 12.7, 13.0, 13.1
    ]
    for i, v in enumerate(vals):
        rows.append(("c1", "m", T0 + dt.timedelta(hours=i), i, v))
    # c2: stationary noise incl. a half-cent value pinning the snap
    for i, v in enumerate([2.0, 2.1, 1.9, 2.005, 2.0, 2.1, 1.9, 2.0]):
        rows.append(("c2", "m", T0 + dt.timedelta(hours=i), i, v))
    return rows


def _run(spark, tmp_path, chunks, name):
    src = tmp_path / f"src_{name}"
    for i, chunk in enumerate(chunks):
        chunk.coalesce(1).write.parquet(str(src / f"chunk{i}"))
    stream = (
        spark.readStream.schema(SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{src}/chunk*")
        .withWatermark("ts", "10 minutes")
    )
    out = str(tmp_path / f"out_{name}")
    ckpt = str(tmp_path / f"ckpt_{name}")
    run_available_now(stream_page_hinkley(stream, lam=4.0), out, ckpt)
    return sorted(
        map(tuple, spark.read.parquet(out).collect()),
        key=lambda t: (t[0], t[3]),
    )


def test_ph_stream_split_invariant_and_matches_reference(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(hours=7)

    one = _run(spark, tmp_path, [df], "one")
    two = _run(
        spark, tmp_path,
        [df.where(F.col("ts") < split), df.where(F.col("ts") >= split)],
        "two",
    )
    assert one == two  # bit-equal across the micro-batch split
    assert len(one) == len(rows)

    for conv in ("c1", "c2"):
        ref = reference_page_hinkley(
            [(r[2], r[3], r[4]) for r in rows if r[0] == conv]
        )
        got = [t[5] for t in one if t[0] == conv]
        assert got == pytest.approx(ref, abs=0)  # exact, not approx

    by = {(t[0], t[3]): t for t in one}
    # the shifted series alerts after the level shift, not before
    assert by[("c1", 19)][6] is True
    assert by[("c1", 9)][6] is False
    # stationary series never alerts at lambda=4
    assert all(not by[("c2", i)][6] for i in range(8))


def test_ph_stream_late_rows_dropped(spark, tmp_path):
    rows = _rows()
    df = spark.createDataFrame(rows, SCHEMA)
    split = T0 + dt.timedelta(hours=7)
    early = df.where(F.col("ts") < split)
    # replay chunk1 again as chunk3: every row is at-or-before the
    # state's last (ts, turn_idx) -> dropped, output identical
    three = _run(
        spark, tmp_path,
        [early, df.where(F.col("ts") >= split), early],
        "replay",
    )
    one = _run(spark, tmp_path, [df], "base")
    assert three == one

"""Streaming expanding z-score must be BIT-EQUAL to the batch
operator: the expanding stats (n, Σx, Σx²) over cent-snapped int64
values are exact integers, so carrying them across micro-batches
replays the identical IEEE divide + √ the batch window form performs.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import expanding_zscore
from timeseriescorrelation_spark.streaming.zscore_stream import stream_zscore
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
    # includes an exact .5-cent value (0.125) to pin the
    # half-away-from-zero cent snap, and a constant prefix (5.5, 5.5)
    # is absent here but covered by the constant-series case below
    vals = [3.1, 4.7, 2.2, 8.8, 8.9, 1.0, 5.5, 5.5, 7.25, 0.125]
    for i, v in enumerate(vals):
        rows.append(("c1", "m", T0 + dt.timedelta(hours=i), i, v))
    # second series interleaving across the batch split
    for i, v in enumerate([100.0, 50.0, 75.0, 75.0, 60.0]):
        rows.append(("c2", "m", T0 + dt.timedelta(hours=2 * i + 1), i, v))
    # constant series: variance stays 0 → z NULL throughout
    for i in range(4):
        rows.append(("c3", "m", T0 + dt.timedelta(hours=i), i, 2.0))
    return rows


def _key(t):
    return (t[0], t[3])


def test_stream_zscore_bit_equal_to_batch(spark, tmp_path):
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
    run_available_now(stream_zscore(stream, min_n=3), out, ckpt)

    got = sorted(map(tuple, spark.read.parquet(out).collect()), key=_key)
    want = sorted(
        map(tuple, expanding_zscore(df, min_n=3).collect()), key=_key
    )
    assert got == want  # bit-equal, including NULL z rows
    assert len(got) == len(rows)
    # sanity: the constant series never scores, the others do
    assert all(t[6] is None for t in got if t[0] == "c3")
    assert any(t[6] is not None for t in got if t[0] == "c1")


def test_batch_expanding_zscore_shape(spark):
    df = spark.createDataFrame(_rows(), SCHEMA)
    res = expanding_zscore(df, min_n=3).collect()
    by = {(r.conv_id, r.turn_idx): r for r in res}
    # first min_n points of every series are NULL (too few priors)
    for c in ("c1", "c2", "c3"):
        for i in range(3):
            assert by[(c, i)].z is None
    # n_prior counts exactly the earlier points of the same series
    assert by[("c1", 7)].n_prior == 7
    # hand value: point 3 of c1 scored against priors {310,470,220}
    import math

    pri = [310, 470, 220]
    n, s, ss = len(pri), sum(pri), sum(p * p for p in pri)
    z = (880 * n - s) / math.sqrt(n * ss - s * s)
    assert by[("c1", 3)].z == math.floor(z * 1e6) / 1e6

"""LTTB downsampling (fixed-anchor variant) and chunk-level
cross-document dedup — fixtures with the decisive edges (known
triangle-argmax, endpoint pinning, a doc sharing a window with
another)."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.analytics import lttb_downsample
from timeseriescorrelation_spark.operators.textstats import (
    chunk_dup_stats,
    chunk_windows,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _pt(minute, v, i, hour=0):
    return (
        "c1", "m",
        T0 + dt.timedelta(hours=hour, minutes=minute), i, float(v),
    )


def test_lttb_picks_largest_triangle_point(spark):
    # three hour-buckets; the middle bucket has a flat baseline of 5.0
    # plus one big spike to 50.0 — the spike forms by far the largest
    # triangle with the neighbor-mean anchors and must be chosen.
    rows = (
        [_pt(m, 5.0, m, hour=0) for m in (0, 30)]
        + [
            _pt(0, 5.0, 100, hour=1),
            _pt(20, 50.0, 101, hour=1),  # the spike
            _pt(40, 5.0, 102, hour=1),
        ]
        + [_pt(m, 5.0, 200 + m, hour=2) for m in (0, 30)]
    )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = {r.bucket_ts: r for r in lttb_downsample(df, "hour").collect()}
    mid = out[T0 + dt.timedelta(hours=1)]
    assert mid.value == 50.0
    assert mid.n == 3


def test_lttb_pins_endpoints(spark):
    # first bucket must emit its FIRST point, last bucket its LAST
    rows = [
        _pt(10, 1.0, 0, hour=0), _pt(50, 2.0, 1, hour=0),
        _pt(5, 3.0, 2, hour=1), _pt(30, 4.0, 3, hour=1),
        _pt(1, 5.0, 4, hour=2), _pt(59, 6.0, 5, hour=2),
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = {r.bucket_ts: r for r in lttb_downsample(df, "hour").collect()}
    assert out[T0].value == 1.0  # first point of first bucket
    assert out[T0 + dt.timedelta(hours=2)].value == 6.0  # last of last


def test_lttb_single_bucket_series_keeps_first_point(spark):
    rows = [_pt(1, 7.0, 0), _pt(2, 8.0, 1)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = lttb_downsample(df, "hour").collect()
    assert len(out) == 1 and out[0].value == 7.0


DOC_SCHEMA = "doc_id long, text string"


def test_chunk_dup_stats_flags_shared_windows(spark):
    # doc 1 and doc 2 share their entire (identical) text -> every
    # chunk duplicated; doc 3 is unique -> zero duplicated chunks
    text = " ".join(f"tok{i}" for i in range(120))
    uniq = " ".join(f"other{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, text), (2, text), (3, uniq)], DOC_SCHEMA
    )
    out = {r.doc_id: r for r in chunk_dup_stats(df).collect()}
    assert out[1].dup_frac == 1.0 and out[2].dup_frac == 1.0
    assert out[3].dup_frac == 0.0
    assert out[1].n_chunks == out[3].n_chunks


def test_chunk_windows_tail_covered_exactly_once(spark):
    # 95 tokens, width 50 stride 40 -> starts 1, 41, 81;
    # last window has 15 tokens
    text = " ".join(f"t{i}" for i in range(95))
    df = spark.createDataFrame([(1, text)], DOC_SCHEMA)
    ch = chunk_windows(df).orderBy("chunk_idx").collect()
    assert [c.chunk_idx for c in ch] == [0, 1, 2]
    assert [c.n_toks for c in ch] == [50, 50, 15]

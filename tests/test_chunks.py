from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.chunks import (
    compression_stats,
    decode_chunks,
    encode_chunks,
)


def test_chunk_roundtrip_exact(spark, tiny_series):
    s = tiny_series.where(F.col("metric") == "token_len")
    chunks = encode_chunks(s, "day")
    back = decode_chunks(chunks)

    # decoded points must equal the last-wins-free raw points exactly
    want = (
        s.select("conv_id", "metric", "ts", "value")
        .toPandas()
        .sort_values(["conv_id", "metric", "ts", "value"])
        .reset_index(drop=True)
    )
    got = (
        back.toPandas()
        .sort_values(["conv_id", "metric", "ts", "value"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_chunk_counts_and_ratio(spark, tiny_series):
    chunks = encode_chunks(tiny_series, "day")
    stats = compression_stats(chunks).collect()
    by_metric = {r["metric"]: r for r in stats}
    assert set(by_metric) == {"token_len", "tool_calls", "turn_rate"}
    total_points = sum(r["points"] for r in stats)
    assert total_points == tiny_series.count()
    # tool_calls is 0/1-valued → XOR side compresses well even though
    # irregular µs timestamps keep dod codes wide; small per-day chunks
    # also pay the 20-byte header + raw t0/v0
    assert by_metric["tool_calls"]["ratio"] > 1.8
    # turn_rate is noisy doubles — XOR barely helps; >1 still required
    assert all(r["ratio"] > 1.05 for r in stats)


def test_rechunk_compacts_and_roundtrips(spark, tiny_series):
    from timeseriescorrelation_spark.operators.chunks import rechunk

    day = encode_chunks(tiny_series, "day")
    month = rechunk(day, "month")
    n_day, n_month = day.count(), month.count()
    assert n_month < n_day  # many day blobs merge per (conv, metric)
    # point-lossless across the compaction
    got = sorted(
        (r.conv_id, r.metric, r.ts, r.value)
        for r in decode_chunks(month).collect()
    )
    want = sorted(
        (r.conv_id, r.metric, r.ts, r.value)
        for r in tiny_series.select("conv_id", "metric", "ts", "value")
        .collect()
    )
    assert got == want
    # fewer blobs, same points, longer XOR context -> ratio not worse
    s_day = {r.metric: r.ratio for r in compression_stats(day).collect()}
    s_month = {
        r.metric: r.ratio for r in compression_stats(month).collect()
    }
    assert all(s_month[m] >= s_day[m] for m in s_day)

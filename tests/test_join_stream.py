"""Stream-stream interval join: cross-micro-batch pairing via state,
batch-equivalence of the sink."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.streaming.join_stream import (
    stream_interval_join,
)
from timeseriescorrelation_spark.streaming.rollup_stream import (
    run_available_now,
)

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)
REQ_SCHEMA = "conv_id string, req_ts timestamp, req_id int"
RESP_SCHEMA = "conv_id string, resp_ts timestamp, resp_id int"


def _t(minutes, seconds=0):
    return T0 + dt.timedelta(minutes=minutes, seconds=seconds)


def test_stream_interval_join_matches_batch(spark, tmp_path):
    reqs = [
        ("c1", _t(0), 1),
        ("c1", _t(20), 2),
        ("c2", _t(5), 3),
        ("c3", _t(8), 4),   # never answered
    ]
    resps = [
        ("c1", _t(2), 10),      # matches req 1 (2 min)
        ("c1", _t(25), 11),     # matches req 2 (5 min)
        ("c1", _t(45), 12),     # beyond req2+10min -> no match
        ("c2", _t(5, 30), 13),  # matches req 3 (30 s)
        ("c2", _t(4), 14),      # BEFORE the request -> no match
    ]
    # split so that req 2 (batch 1 of reqs) only meets resp 11 in the
    # SECOND response file: state, not intra-batch data, must pair them
    (spark.createDataFrame(reqs, REQ_SCHEMA).coalesce(1)
     .write.parquet(str(tmp_path / "req" / "chunk1")))
    (spark.createDataFrame(resps[:1], RESP_SCHEMA).coalesce(1)
     .write.parquet(str(tmp_path / "resp" / "chunk1")))
    (spark.createDataFrame(resps[1:], RESP_SCHEMA).coalesce(1)
     .write.parquet(str(tmp_path / "resp" / "chunk2")))

    req_stream = (
        spark.readStream.schema(REQ_SCHEMA)
        .parquet(f"{tmp_path}/req/chunk*")
        .withWatermark("req_ts", "1 hour")
    )
    resp_stream = (
        spark.readStream.schema(RESP_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(f"{tmp_path}/resp/chunk*")
        .withWatermark("resp_ts", "1 hour")
    )
    joined = stream_interval_join(
        req_stream, resp_stream, max_delay_seconds=600
    )
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_available_now(joined, out, ckpt)

    got = {
        (r.conv_id, r.req_ts, r.resp_ts, r.latency_s)
        for r in spark.read.parquet(out).collect()
    }
    want_pairs = {
        ("c1", _t(0), _t(2), 120),
        ("c1", _t(20), _t(25), 300),
        ("c2", _t(5), _t(5, 30), 30),
    }
    assert got == want_pairs

    # batch equivalence: same operator body on static frames
    batch = stream_interval_join(
        spark.createDataFrame(reqs, REQ_SCHEMA),
        spark.createDataFrame(resps, RESP_SCHEMA),
        max_delay_seconds=600,
    )
    assert {tuple(r) for r in batch.collect()} == want_pairs

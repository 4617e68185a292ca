"""Watermarked stream-stream interval join — request/response pairing
on live data (tool call ⋈ tool result within a bounded delay), the
last Structured Streaming surface the engine exposes next to the 1m
tier, sessionization, stateful fill/rate/EWMA, and ingest dedup.

Batch pairing of the same shape is operators/intervals.py's binned
interval join; continuously, Spark's stream-stream inner join keeps
BOTH sides in state until the watermark plus the join's event-time
range bound proves no future match can arrive — so the range condition
is not just query semantics, it is the STATE EVICTION proof.  Without
`right.ts <= left.ts + max_delay`, state grows unboundedly; with it,
state is O(arrival-rate × (watermark + max_delay)).

Scale notes: both sides shuffle once, keyed by the join key (conv_id)
— the same partitioning the batch engine uses; per-key state is a
timestamp-indexed buffer evicted by watermark.  Late rows beyond the
watermark are dropped by the SOURCE watermark (counted upstream by the
ingest DQ report), never silently matched.

The cross-micro-batch case (request in batch N, response in batch
N+1 — only carried state can pair them) and batch-equivalence (sink
== the batch inner join over the same input) are asserted in
tests/test_join_stream.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_interval_join(requests: DataFrame, responses: DataFrame,
                         key: str = "conv_id",
                         req_ts: str = "req_ts", resp_ts: str = "resp_ts",
                         max_delay_seconds: int = 600) -> DataFrame:
    """Inner-join each request to the responses that land within
    [req_ts, req_ts + max_delay] on the same key.

    Both inputs must already carry `withWatermark` on their timestamp
    column; the watermark delay bounds LATENESS, `max_delay_seconds`
    bounds the MATCH WINDOW, and together they bound state."""
    r = requests.alias("req")
    s = responses.alias("resp")
    cond = (
        (F.col(f"req.{key}") == F.col(f"resp.{key}"))
        & (F.col(f"resp.{resp_ts}") >= F.col(f"req.{req_ts}"))
        & (
            F.col(f"resp.{resp_ts}")
            <= F.col(f"req.{req_ts}")
            + F.expr(f"INTERVAL {int(max_delay_seconds)} SECONDS")
        )
    )
    return r.join(s, cond, "inner").select(
        F.col(f"req.{key}").alias(key),
        F.col(f"req.{req_ts}").alias(req_ts),
        F.col(f"resp.{resp_ts}").alias(resp_ts),
        (
            (
                F.col(f"resp.{resp_ts}").cast("long")
                - F.col(f"req.{req_ts}").cast("long")
            )
        ).alias("latency_s"),
    )

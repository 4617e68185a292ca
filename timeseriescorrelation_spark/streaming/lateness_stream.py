"""Streaming lateness monitor — the continuous twin of
dq.lateness_audit: per metric, each arriving observation is scored
against the RUNNING MAX event time of everything that arrived before
it (the data's own arrival sequence), emitting per-row lateness the
downstream sink aggregates into watermark-sizing reports while the
pipeline runs.

`applyInPandasWithState` holds two numbers per metric
(last_arrival_idx, max_ts_us) — the cross-micro-batch running max the
batch operator gets from one window.  Within a micro-batch rows are
processed in arrival order (turn_idx); a row at or before the state's
last arrival index is a REPLAY and is dropped (its lateness was
already emitted).  Batch equivalence (aggregated sink ==
dq.lateness_audit) is asserted in tests/test_lateness_stream.py with
a cross-chunk running max.

State hygiene: ProcessingTimeTimeout is deliberately NOT used — the
whole point is watching for arbitrarily late data, so per-metric
state (two longs × |metrics|) lives for the query's lifetime; that is
metadata-sized by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "metric string, ts timestamp, turn_idx long, late_us long"
)
STATE_SCHEMA = "last_idx long, max_ts_us long"


def stream_lateness(stream: DataFrame) -> DataFrame:
    """stream (metric, ts, turn_idx, ...) → append stream of
    (metric, ts, turn_idx, late_us)."""

    def _late(key, pdfs, state):
        (metric,) = key
        li, mx = state.get if state.exists else (None, None)
        parts = [p for p in pdfs if len(p)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        ts_us = (
            pdf["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
        )
        idx = pdf["turn_idx"].to_numpy().astype(np.int64)
        order = np.argsort(idx, kind="stable")
        ts_us, idx = ts_us[order], idx[order]
        if li is not None:
            live = idx > li
            ts_us, idx = ts_us[live], idx[live]
        if not len(ts_us):
            return
        # running max of event time over earlier arrivals: seed with
        # the cross-batch state, shift by one so each row sees only
        # strictly-earlier arrivals
        run = np.maximum.accumulate(ts_us)
        prev_max = np.r_[np.int64(mx if mx is not None else ts_us[0]),
                         run[:-1]]
        if mx is not None:
            prev_max = np.maximum(prev_max, np.int64(mx))
        late = np.maximum(prev_max - ts_us, 0)
        state.update((int(idx[-1]), int(max(run[-1],
                                            mx if mx is not None
                                            else run[-1]))))
        yield pd.DataFrame(
            {
                "metric": metric,
                "ts": ts_us.astype("datetime64[us]"),
                "turn_idx": idx,
                "late_us": late,
            }
        )

    return stream.groupBy("metric").applyInPandasWithState(
        _late, OUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout"
    )

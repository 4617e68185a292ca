"""Streaming online CUSUM against a fixed reference (μ, σ): the
deployable changepoint monitor, with THREE integers of carried state
per live series.

Why this is exactly the batch answer: `analytics.cusum_fixed`
telescopes the clamped recursion to s⁺ = p − min(0, min p) over the
running sum p of integer cent deviations.  p, min p and max p are
exact int64 — carrying them across micro-batches replays the batch
window algebra term for term, so the streamed scores are BIT-EQUAL to
batch on any split (asserted in tests/test_cusum_stream.py).  Floats
in state would accumulate in a split-dependent order; ints cannot.

Ordering/late-data contract (same as zscore_stream / ewma_stream):
within a micro-batch rows sort by (ts, turn_idx); rows at or before
the state's last (ts, turn_idx) are late past emission and dropped —
scores are never retracted.  Run with a watermark at least the
expected disorder.

State hygiene: EventTimeTimeout evicts series idle past
``evict_seconds`` beyond the watermark — O(live series) state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int,"
    " value double, s_plus double, s_minus double, alert boolean"
)
STATE_SCHEMA = "last_ts_us long, last_idx long, p long, lo long, hi long"


def stream_cusum(stream: DataFrame, mu: float, sigma: float,
                 h: float = 5.0, evict_seconds: int = 86400) -> DataFrame:
    """stream (conv_id, metric, ts, turn_idx, value) with a watermark
    on ts → append stream of online CUSUM scores + alert flags."""
    mu_c = int(round(mu * 100))
    thr = float(h) * int(round(sigma * 100))

    def _cusum(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        conv_id, metric = key
        lt, li, p0, lo0, hi0 = (
            state.get if state.exists else (None, None, 0, 0, 0)
        )

        parts = [x for x in pdfs if len(x)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            ts_us = (
                pdf["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
            )
            idx = pdf["turn_idx"].to_numpy().astype(np.int64)
            vals = pdf["value"].to_numpy(dtype=np.float64)
            order = np.lexsort((idx, ts_us))
            ts_us, idx, vals = ts_us[order], idx[order], vals[order]
            if lt is not None:
                live = (ts_us > lt) | ((ts_us == lt) & (idx > li))
                ts_us, idx, vals = ts_us[live], idx[live], vals[live]
            if len(ts_us):
                # half-away-from-zero cent snap (matches F.round)
                x = vals * 100
                v = np.where(
                    x >= 0, np.floor(x + 0.5), np.ceil(x - 0.5)
                ).astype(np.int64)
                p = p0 + np.cumsum(v - mu_c)
                # running extrema seeded by state: min(0, lo0, min p),
                # identical to the batch least(0, min over prefix)
                lo = np.minimum(np.minimum.accumulate(p), lo0)
                lo = np.minimum(lo, 0)
                hi = np.maximum(np.maximum.accumulate(p), hi0)
                hi = np.maximum(hi, 0)
                sp = (p - lo).astype(np.float64)
                sm = (hi - p).astype(np.float64)
                state.update((
                    int(ts_us[-1]), int(idx[-1]),
                    int(p[-1]), int(lo[-1]), int(hi[-1]),
                ))
                yield pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "metric": metric,
                        "ts": ts_us.astype("datetime64[us]"),
                        "turn_idx": idx.astype(np.int32),
                        "value": vals,
                        "s_plus": sp / 100,
                        "s_minus": sm / 100,
                        "alert": (sp > thr) | (sm > thr),
                    }
                )

        if state.exists:
            lt_now = state.get[0]
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(wm + 1, lt_now // 1_000 + evict_seconds * 1_000)
            )

    return stream.groupBy("conv_id", "metric").applyInPandasWithState(
        _cusum, OUT_SCHEMA, STATE_SCHEMA, "append", "EventTimeTimeout"
    )

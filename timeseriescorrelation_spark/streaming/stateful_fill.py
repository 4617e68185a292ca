"""Stateful streaming LOCF gap-fill (SURVEY §2.9 tier-2):
`applyInPandasWithState` keeps one tiny record per live series —
(last emitted grid bucket, its carried value) — and every micro-batch
extends each series' dense grid from that state through the newest
observation, exactly like the batch `fill_locf` would.

Semantics (mirrors operators.gapfill.fill_locf):

- observations collapse last-wins per grid bucket by the SAME packed
  (µs-offset-in-bucket, turn_idx) order key as the batch path;
- an observed bucket emits `filled=false`; every grid step between two
  observed buckets carries the earlier value with `filled=true`;
- emission is EAGER (a bucket is emitted when its first observation
  arrives — append mode cannot retract), so an observation landing in
  an ALREADY-EMITTED bucket is dropped.  Run with a watermark at least
  as long as your disorder horizon so buckets close before they are
  reached; the `test_stateful_fill` equivalence test demonstrates the
  in-order case is bit-identical to batch `fill_locf`.

State hygiene: the watermark drives EventTimeTimeout eviction — a
series idle for `evict_steps` grid steps past the watermark has its
state removed, so total state is O(live series), not O(ever-seen
series).  A re-appearing evicted series simply restarts its grid (a
new segment — the same dormancy semantics as fill_locf's
max_gap_steps, with evict_steps as the bound).

Scale notes: state is 16 bytes + key per series; each micro-batch
shuffles only the batch's observations on (conv_id, metric); grid rows
are born inside the stateful operator AFTER that shuffle (the same
O(observations)-shuffle property the batch fill has).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from timeseriescorrelation_spark.operators.gapfill import (
    STEP_SECONDS,
    STEP_TRUNC,
)
from timeseriescorrelation_spark.operators.rollup import _OFF_BITS

OUT_SCHEMA = (
    "conv_id string, metric string, grid_ts timestamp, "
    "value double, filled boolean"
)
STATE_SCHEMA = "last_bucket_us long, last_value double"


def stream_fill_locf(stream: DataFrame, step: str = "1h",
                     evict_steps: int = 48) -> DataFrame:
    """Streaming LOCF fill over (conv_id, metric, ts, turn_idx, value).

    ``stream`` must already carry a watermark on ``ts`` (the stateful
    operator requires one for EventTimeTimeout eviction)."""
    step_us = STEP_SECONDS[step] * 1_000_000
    step_ms = step_us // 1_000
    idx_bits = 63 - _OFF_BITS[STEP_TRUNC[step]]
    cap = (1 << idx_bits) - 1

    def _fill(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        conv_id, metric = key
        lb, lv = state.get if state.exists else (None, None)

        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            ts_us = (
                pdf["ts"].to_numpy().astype("datetime64[us]").view(np.int64)
            )
            bucket = ts_us // step_us * step_us
            off = ts_us - bucket
            keyv = off * (1 << idx_bits) + np.minimum(
                pdf["turn_idx"].to_numpy().astype(np.int64), cap
            )
            vals = pdf["value"].to_numpy(dtype=np.float64)
            order = np.lexsort((keyv, bucket))
            b_s, v_s = bucket[order], vals[order]
            last_of_bucket = np.r_[b_s[1:] != b_s[:-1], True]
            ub, uv = b_s[last_of_bucket], v_s[last_of_bucket]
            if lb is not None:
                live = ub > lb  # late past emission: dropped (see doc)
                ub, uv = ub[live], uv[live]

            if len(ub):
                g_ts, g_v, g_f = [], [], []
                prev_b, prev_v = lb, lv
                for b, v in zip(ub, uv):
                    if prev_b is not None:
                        gap = np.arange(prev_b + step_us, b, step_us)
                        if len(gap):
                            g_ts.append(gap)
                            g_v.append(np.full(len(gap), prev_v))
                            g_f.append(np.ones(len(gap), dtype=bool))
                    g_ts.append(np.array([b]))
                    g_v.append(np.array([v]))
                    g_f.append(np.array([False]))
                    prev_b, prev_v = b, v
                state.update((int(prev_b), float(prev_v)))
                out_ts = np.concatenate(g_ts)
                yield pd.DataFrame(
                    {
                        "conv_id": conv_id,
                        "metric": metric,
                        "grid_ts": out_ts.astype("datetime64[us]"),
                        "value": np.concatenate(g_v),
                        "filled": np.concatenate(g_f),
                    }
                )

        if state.exists:
            lb_now = state.get[0]
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(wm + 1, lb_now // 1_000 + evict_steps * step_ms)
            )

    return stream.groupBy("conv_id", "metric").applyInPandasWithState(
        _fill, OUT_SCHEMA, STATE_SCHEMA, "append", "EventTimeTimeout"
    )

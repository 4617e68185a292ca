"""Streaming CEP-lite pattern detection: the batch automaton
(operators/intervals.pattern_matches) run continuously with FOUR
integers of carried state per live key — (stage, t0_us, last_ts_us,
last_idx).

Why this is exactly the batch answer: the automaton is a deterministic
function of the processed step-event sequence, and the carried
(stage, t0) replays the identical integer transitions across
micro-batch boundaries — matches are bit-equal to batch on any split
(asserted in tests/test_pattern_stream.py).

Late-data contract: rows at or before the state's last (ts, tie) are
late past emission and dropped (matches are never retracted); run
with a watermark at least the expected disorder.  State hygiene:
EventTimeTimeout evicts keys idle past ``evict_seconds`` beyond the
watermark.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

OUT_SCHEMA = (
    "key string, start_ts timestamp, end_ts timestamp,"
    " duration_s double"
)
STATE_SCHEMA = "last_ts_us long, last_idx long, stage int, t0_us long"


def stream_pattern(stream: DataFrame, steps: list[str],
                   key_col: str = "key", type_col: str = "event_type",
                   ts_col: str = "ts", tie_col: str = "turn_idx",
                   within_seconds: int = 3600,
                   evict_seconds: int = 86400) -> DataFrame:
    """stream (key, event_type, ts, tie) with a watermark on ts →
    append stream of completed pattern matches per key."""
    step_list = [str(s) for s in steps]
    win_us = int(within_seconds) * 1_000_000

    def _scan(key, pdfs, state):
        if state.hasTimedOut:
            state.remove()
            return
        (key_val,) = key
        lt, li, stage, t0 = (
            state.get if state.exists else (None, None, 0, 0)
        )

        parts = [p for p in pdfs if len(p)]
        if parts:
            pdf = pd.concat(parts, ignore_index=True)
            ts_us = (
                pdf[ts_col].to_numpy().astype("datetime64[us]")
                .view(np.int64)
            )
            idx = pdf[tie_col].to_numpy().astype(np.int64)
            sts = pdf[type_col].astype(str).to_numpy()
            order = np.lexsort((idx, ts_us))
            ts_us, idx, sts = ts_us[order], idx[order], sts[order]
            if lt is not None:
                live = (ts_us > lt) | ((ts_us == lt) & (idx > li))
                ts_us, idx, sts = ts_us[live], idx[live], sts[live]
            if len(ts_us):
                out_s, out_e = [], []
                for t, st in zip(ts_us, sts):
                    if st not in step_list:
                        continue
                    if stage > 0 and t - t0 > win_us:
                        stage = 0
                    if st == step_list[stage]:
                        if stage == 0:
                            t0 = int(t)
                        stage += 1
                        if stage == len(step_list):
                            out_s.append(t0)
                            out_e.append(int(t))
                            stage = 0
                state.update(
                    (int(ts_us[-1]), int(idx[-1]), int(stage), int(t0))
                )
                if out_s:
                    yield pd.DataFrame(
                        {
                            "key": key_val,
                            "start_ts": pd.Series(
                                out_s, dtype="int64"
                            ).astype("datetime64[us]"),
                            "end_ts": pd.Series(
                                out_e, dtype="int64"
                            ).astype("datetime64[us]"),
                            "duration_s": [
                                (e - s) / 1e6
                                for s, e in zip(out_s, out_e)
                            ],
                        }
                    )

        if state.exists:
            lt_now = state.get[0]
            wm = state.getCurrentWatermarkMs()
            state.setTimeoutTimestamp(
                max(wm + 1, lt_now // 1_000 + evict_seconds * 1_000)
            )

    return stream.groupBy(key_col).applyInPandasWithState(
        _scan, OUT_SCHEMA, STATE_SCHEMA, "append", "EventTimeTimeout"
    )

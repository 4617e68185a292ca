"""W5 rolling/sliding event-time stats: the rangeBetween frame must
match a brute-force python oracle on a hand-built series with
irregular gaps, frame-boundary ties, and equal-timestamp peers."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.rolling import rolling_stats

T0 = dt.datetime(2024, 1, 1, 0, 0, 0)


def _mk(sec_offsets_vals):
    return [
        ("u1", i, T0 + dt.timedelta(seconds=s), float(v))
        for i, (s, v) in enumerate(sec_offsets_vals)
    ]


def test_rolling_matches_python_oracle(spark):
    # offsets chosen to hit: exact boundary (3600s back IS included),
    # just-outside (3601s), equal-ts peers, and a long dormant gap
    data = _mk([
        (0, 1.0),
        (10, 2.0),
        (10, 3.0),      # equal-ts peer of the previous row
        (3600, 4.0),    # exactly 1h after t=0 -> frame includes t=0
        (3611, 5.0),    # 3601s after t=10 -> t=10 rows fall out
        (20000, 6.0),   # dormant gap -> frame is just itself
    ])
    df = spark.createDataFrame(
        data, "user_id string, event_id long, ts timestamp, value double"
    )
    got = {
        r.event_id: (r.roll_cnt, r.roll_min, r.roll_max, r.roll_sum)
        for r in rolling_stats(df, ["user_id"], 3600).collect()
    }
    for eid, (s, v) in enumerate(
        [(0, 1.0), (10, 2.0), (10, 3.0), (3600, 4.0), (3611, 5.0),
         (20000, 6.0)]
    ):
        frame = [
            fv for fs, fv in
            [(0, 1.0), (10, 2.0), (10, 3.0), (3600, 4.0), (3611, 5.0),
             (20000, 6.0)]
            if s - 3600 <= fs <= s
        ]
        assert got[eid] == (
            len(frame), min(frame), max(frame), round(sum(frame), 6)
        ), (eid, got[eid], frame)


def test_rolling_partitions_do_not_leak(spark):
    rows = [("a", 0, T0, 1.0), ("b", 1, T0, 100.0)]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, value double"
    )
    got = {r.user_id: r.roll_sum for r in
           rolling_stats(df, ["user_id"], 3600).collect()}
    assert got == {"a": 1.0, "b": 100.0}

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


def test_rolling_corr_matches_numpy(spark):
    """Integer-exact windowed Pearson equals numpy's corrcoef over the
    same trailing frames; sub-min_n frames and zero-variance frames
    yield NULL."""
    import numpy as np

    from timeseriescorrelation_spark.operators.rolling import rolling_corr

    pts = [(i * 60, (i * 13) % 7 + 1, ((i * 29) % 11) * 3 + 2)
           for i in range(40)]
    rows = [
        ("c1", T0 + dt.timedelta(seconds=s), int(x), int(y))
        for s, x, y in pts
    ]
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, x long, y long")
    got = {
        int((r.ts - T0).total_seconds()): (r.roll_n, r.roll_corr)
        for r in rolling_corr(df, ["conv_id"], 600, min_n=3).collect()
    }
    for s, _, _ in pts:
        frame = [(x, y) for fs, x, y in pts if s - 600 <= fs <= s]
        n, (rn, rc) = len(frame), got[s]
        assert rn == n
        xs = np.array([f[0] for f in frame], dtype=float)
        ys = np.array([f[1] for f in frame], dtype=float)
        if n < 3 or xs.std() == 0 or ys.std() == 0:
            assert rc is None
        else:
            assert abs(rc - np.corrcoef(xs, ys)[0, 1]) < 1e-6, (s, rc)


def test_rolling_corr_zero_variance_null(spark):
    from timeseriescorrelation_spark.operators.rolling import rolling_corr

    rows = [("c", T0 + dt.timedelta(seconds=60 * i), 5, i) for i in range(10)]
    df = spark.createDataFrame(
        rows, "conv_id string, ts timestamp, x long, y long"
    )
    out = rolling_corr(df, ["conv_id"], 3600, min_n=2).collect()
    assert all(r.roll_corr is None for r in out)  # x constant -> dx=0


def test_rolling_partitions_do_not_leak(spark):
    rows = [("a", 0, T0, 1.0), ("b", 1, T0, 100.0)]
    df = spark.createDataFrame(
        rows, "user_id string, event_id long, ts timestamp, value double"
    )
    got = {r.user_id: r.roll_sum for r in
           rolling_stats(df, ["user_id"], 3600).collect()}
    assert got == {"a": 1.0, "b": 100.0}

"""Skyline (Pareto frontier) over (volume up, error rate down)."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.analytics import (
    skyline_volume_errors,
)

T0 = dt.datetime(2026, 4, 1)
SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double"
)


def _events(spark, per_user):
    """per_user: {user: (n_ok, n_err)}."""
    rows = []
    i = 0
    for u, (ok, err) in per_user.items():
        for _ in range(ok):
            rows.append((i, T0 + dt.timedelta(minutes=i), u, "click", 1.0))
            i += 1
        for _ in range(err):
            rows.append((i, T0 + dt.timedelta(minutes=i), u, "error", 1.0))
            i += 1
    return spark.createDataFrame(rows, SCHEMA)


def test_skyline_basic_dominance(spark):
    # u1 (10, 0) dominates u2 (5, 1) and u3 (10, 2);
    # u4 (20, 3) has more volume but worse rate than u1 -> both stay
    df = _events(spark, {1: (10, 0), 2: (4, 1), 3: (8, 2), 4: (17, 3)})
    got = {r["actor"]: r for r in skyline_volume_errors(df).collect()}
    assert set(got) == {1, 4}
    assert got[1]["vol"] == 10 and got[1]["errs"] == 0
    assert abs(got[4]["err_rate"] - 0.15) < 1e-9


def test_skyline_rate_cross_multiplication(spark):
    # u1: vol 9, 1 err (rate .111); u2: vol 12, 2 errs (rate .167):
    # u2 has more volume but worse rate -> both survive.
    # u3: vol 12, 1 err dominates u1 (more vol, better rate) and u2
    # (same vol, fewer errors).
    df = _events(spark, {1: (8, 1), 2: (10, 2), 3: (11, 1)})
    got = {r["actor"] for r in skyline_volume_errors(df).collect()}
    assert got == {3}


def test_skyline_exact_duplicates_both_kept(spark):
    df = _events(spark, {1: (5, 1), 2: (5, 1)})
    got = {r["actor"] for r in skyline_volume_errors(df).collect()}
    assert got == {1, 2}

"""Streak report (operators/tsdiag.streak_report): hand-built
up/down/flat sequences with known longest runs; flat days break both
runs; the current streak is the last island."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.tsdiag import streak_report

T0 = dt.datetime(2024, 3, 1)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, values, metric="m"):
    rows = [("c", metric, T0 + dt.timedelta(days=i), i, float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_known_streaks(spark):
    # deltas: + + + - - + (up-run 3, down-run 2, last run = 1 up)
    vals = [1, 2, 3, 4, 2, 1, 5]
    r = streak_report(_mk(spark, vals)).collect()[0]
    assert r.n_days == 7
    assert r.max_up_streak == 3
    assert r.max_down_streak == 2
    assert r.last_len == 1 and r.last_dir == 1


def test_flat_breaks_runs(spark):
    # deltas: + 0 + — the flat day splits the ups into 1+1
    vals = [1, 2, 2, 3]
    r = streak_report(_mk(spark, vals)).collect()[0]
    assert r.max_up_streak == 1
    assert r.max_down_streak is None
    assert r.last_len == 1 and r.last_dir == 1


def test_all_down_current(spark):
    vals = [9, 7, 5, 3]
    r = streak_report(_mk(spark, vals)).collect()[0]
    assert r.max_down_streak == 3 and r.max_up_streak is None
    assert r.last_len == 3 and r.last_dir == -1

"""Watermark lateness audit."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.dq import lateness_audit

BASE = dt.datetime(2026, 1, 1)


def _series(spark, rows, metric="a"):
    # rows: (arrival_idx, event_minute)
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(minutes=m), int(o), 1.0)
         for o, m in rows],
        ["metric", "ts", "turn_idx", "value"],
    )


def test_in_order_stream_no_lateness(spark):
    out = lateness_audit(
        _series(spark, [(i, i) for i in range(10)])
    ).collect()[0]
    assert out["n_late"] == 0 and out["late_share"] == 0.0
    assert out["max_lateness_s"] == 0.0
    assert out["drop_1m"] == out["drop_5m"] == out["drop_15m"] == 0


def test_late_event_measured_against_running_max(spark):
    # arrivals: t=0, t=60, then an event stamped t=2 (58 min late),
    # then t=61
    rows = [(0, 0), (1, 60), (2, 2), (3, 61)]
    out = lateness_audit(_series(spark, rows)).collect()[0]
    assert out["n_late"] == 1
    assert out["max_lateness_s"] == 58 * 60.0
    assert out["drop_1m"] == 1 and out["drop_15m"] == 1
    assert out["late_share"] == 0.25


def test_threshold_boundaries(spark):
    # exactly 60 s late -> NOT dropped at a 1-minute watermark
    # (strict >), 61 s -> dropped
    rows = [(0, 0), (1, 10), (2, 9), (3, 20),
            (4, 20 - 61 / 60.0)]
    out = lateness_audit(_series(spark, rows)).collect()[0]
    # event 2 is 60 s late; event 4 is 61 s late
    assert out["n_late"] == 2
    assert out["drop_1m"] == 1
    assert out["drop_5m"] == 0

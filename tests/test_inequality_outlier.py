"""Atkinson index, Grubbs screen, crossing rate, reciprocity —
hand cases + boundary invariants."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.activity import atkinson_daily
from timeseriescorrelation_spark.operators.graphrank import reciprocity
from timeseriescorrelation_spark.operators.nptests import grubbs_daily
from timeseriescorrelation_spark.operators.tsdiag import crossing_rate

BASE = dt.datetime(2026, 1, 1)


def _events(spark, rows):
    # rows: (user_id, minute, value)
    return spark.createDataFrame(
        [(int(u), BASE + dt.timedelta(minutes=m), float(v))
         for u, m, v in rows],
        ["user_id", "ts", "value"],
    )


def test_atkinson_equal_is_zero(spark):
    df = _events(spark, [(u, u, 5.0) for u in range(4)])
    out = atkinson_daily(df).collect()[0]
    assert out["n_units"] == 4
    assert out["atkinson1"] == 0.0


def test_atkinson_matches_hand_formula(spark):
    vals = [1.0, 2.0, 4.0, 8.0]
    df = _events(spark, [(u, u, v) for u, v in enumerate(vals)])
    out = atkinson_daily(df).collect()[0]
    cents = [int(v * 100) for v in vals]
    geo = math.exp(sum(math.log(c) for c in cents) / len(cents))
    a = 1 - geo / (sum(cents) / len(cents))
    assert out["atkinson1"] == pytest.approx(a, abs=2e-6)
    assert 0.0 < out["atkinson1"] < 1.0


def _series(spark, vals, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(minutes=i), i, float(v))
         for i, v in enumerate(vals)],
        ["metric", "ts", "turn_idx", "value"],
    )


def test_grubbs_flags_the_spike(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 100.0]
    out = grubbs_daily(_series(spark, vals)).collect()[0]
    assert out["suspect_value"] == 100.0
    # hand G on cents
    import statistics

    c = [int(v * 100) for v in vals]
    g = max(abs(x - statistics.mean(c)) for x in c) / statistics.stdev(c)
    assert out["g_stat"] == pytest.approx(g, abs=2e-6)


def test_grubbs_low_side_suspect(spark):
    vals = [10.0, 11.0, 9.0, 10.5, 9.5, 0.01]
    out = grubbs_daily(_series(spark, vals)).collect()[0]
    assert out["suspect_value"] == 0.01


def test_grubbs_constant_series_null_g(spark):
    out = grubbs_daily(_series(spark, [5.0] * 4)).collect()[0]
    assert out["g_stat"] is None
    assert out["sd_v"] == 0.0


def test_crossing_rate_alternating_and_monotone(spark):
    alt = crossing_rate(_series(spark, [1.0, 3.0] * 5)).collect()[0]
    assert alt["crossings"] == 9 and alt["crossing_rate"] == 1.0
    mono = crossing_rate(
        _series(spark, [float(i) for i in range(10)], metric="b")
    ).collect()[0]
    assert mono["crossings"] == 1  # crosses its own mean exactly once


def test_crossing_zeros_break_runs(spark):
    # mean = 2; series 1, 2, 3: sign -1, 0, +1 -> products never -1
    out = crossing_rate(_series(spark, [1.0, 2.0, 3.0])).collect()[0]
    assert out["crossings"] == 0


def _edges(spark, triples):
    return spark.createDataFrame(triples, ["src", "dst", "w"])


def test_reciprocity_symmetric_is_one(spark):
    out = reciprocity(
        _edges(spark, [("a", "b", 5), ("b", "a", 5),
                       ("b", "c", 2), ("c", "b", 2)])
    ).collect()[0]
    assert out["reciprocity"] == 1.0


def test_reciprocity_dag_is_zero_and_loops_ignored(spark):
    out = reciprocity(
        _edges(spark, [("a", "b", 5), ("b", "c", 3), ("a", "a", 99)])
    ).collect()[0]
    assert out["n_edges"] == 2
    assert out["w_total"] == 8
    assert out["reciprocity"] == 0.0


def test_reciprocity_partial(spark):
    # a->b 6, b->a 2: reciprocated mass = min each direction = 2+2
    out = reciprocity(
        _edges(spark, [("a", "b", 6), ("b", "a", 2)])
    ).collect()[0]
    assert out["w_reciprocated"] == 4
    assert out["reciprocity"] == 0.5

"""Lorenz deciles, weekend odds ratio, semivariogram."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.abtest import odds_ratio_weekend
from timeseriescorrelation_spark.operators.acf import semivariogram
from timeseriescorrelation_spark.operators.activity import lorenz_deciles

BASE = dt.datetime(2026, 1, 5)  # a Monday


def _events(spark, rows):
    # rows: (user, day, value)
    return spark.createDataFrame(
        [(int(u), BASE + dt.timedelta(days=d), float(v), "ev")
         for u, d, v in rows],
        ["user_id", "ts", "value", "event_type"],
    )


def test_lorenz_equal_units_linear(spark):
    df = _events(spark, [(u, 0, 10.0) for u in range(10)])
    rows = sorted(lorenz_deciles(df).collect(), key=lambda r: r["decile"])
    assert [r["n_units"] for r in rows] == [1] * 10
    for i, r in enumerate(rows, 1):
        assert r["cum_share"] == pytest.approx(i / 10, abs=1e-6)


def test_lorenz_concentration(spark):
    # 9 paupers + 1 whale: bottom 9 deciles hold 9/109 of the mass
    df = _events(spark, [(u, 0, 1.0) for u in range(9)] + [(9, 0, 100.0)])
    rows = sorted(lorenz_deciles(df).collect(), key=lambda r: r["decile"])
    assert rows[-1]["decile_cents"] == 10000
    assert rows[8]["cum_share"] == pytest.approx(9 / 109, abs=1e-6)
    assert rows[-1]["cum_share"] == 1.0


def test_odds_ratio_hand_2x2(spark):
    # BASE is Monday; day 5 = Saturday, day 6 = Sunday
    rows = []
    rows += [(1, 5, 200.0)] * 6 + [(1, 5, 10.0)] * 2      # weekend: a=6 b=2
    rows += [(1, 0, 200.0)] * 3 + [(1, 0, 10.0)] * 9      # weekday: c=3 d=9
    out = odds_ratio_weekend(_events(spark, rows)).collect()[0]
    assert (out["a"], out["b"], out["c"], out["d"]) == (6, 2, 3, 9)
    orr = (6 * 9) / (2 * 3)
    assert out["odds_ratio"] == pytest.approx(orr, abs=1e-6)
    se = math.sqrt(1 / 6 + 1 / 2 + 1 / 3 + 1 / 9)
    assert out["ci_lo"] == pytest.approx(math.exp(math.log(orr) - 1.96 * se),
                                         abs=1e-5)
    assert out["ci_lo"] < orr < out["ci_hi"]


def test_odds_ratio_empty_cell_null(spark):
    rows = [(1, 0, 10.0)] * 4 + [(1, 5, 10.0)] * 2   # no high values at all
    out = odds_ratio_weekend(_events(spark, rows)).collect()[0]
    assert out["odds_ratio"] is None
    assert out["a"] == 0 and out["c"] == 0


def _series(spark, vals, metric="a"):
    return spark.createDataFrame(
        [(metric, BASE + dt.timedelta(hours=i), float(v))
         for i, v in enumerate(vals)],
        ["metric", "ts", "value"],
    )


def test_semivariogram_hand_values(spark):
    # alternating 0/2 (cents 0/200): gamma(odd lags) = 200^2/2 / 1e4 = 2
    # gamma(even lags) = 0
    out = {
        r["lag_h"]: r
        for r in semivariogram(_series(spark, [0.0, 2.0] * 6)).collect()
    }
    assert out[1]["gamma"] == pytest.approx(2.0, abs=1e-6)
    assert out[2]["gamma"] == 0.0
    assert out[3]["gamma"] == pytest.approx(2.0, abs=1e-6)
    assert out[1]["n_pairs"] == 11


def test_semivariogram_missing_hours_drop(spark):
    # hours 0,1,3: lag-1 pairs = (0,1) only; lag-2 = (1,3); lag-3 = (0,3)
    df = spark.createDataFrame(
        [("a", BASE + dt.timedelta(hours=h), float(h)) for h in (0, 1, 3)],
        ["metric", "ts", "value"],
    )
    out = {r["lag_h"]: r["n_pairs"] for r in semivariogram(df).collect()}
    assert out.get(1) == 1 and out.get(2) == 1 and out.get(3) == 1
    assert 4 not in out or out[4] == 0

"""KM median survival + Kendall's W."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.agreement import (
    friedman_test,
    kendall_w,
)
from timeseriescorrelation_spark.operators.survival import median_survival

BASE = dt.datetime(2026, 1, 1)


def _convs(spark, durations_min, metric="m"):
    rows = []
    for i, dur in enumerate(durations_min):
        rows.append((f"c{i}", metric, BASE, 0, 1.0))
        rows.append((f"c{i}", metric,
                     BASE + dt.timedelta(minutes=dur), 1, 1.0))
    rows.append(("zz", metric, BASE + dt.timedelta(days=30), 0, 1.0))
    return spark.createDataFrame(
        rows, ["conv_id", "metric", "ts", "turn_idx", "value"]
    )


def test_median_survival_crossing(spark):
    # 4 deaths at 10/20/30/40 min: S = .8, .6, .4 after 30 -> median 30
    # (the sentinel conv is censored and keeps the risk set at 5)
    out = median_survival(_convs(spark, [10, 20, 30, 40])).collect()
    row = {r["metric"]: r for r in out}["m"]
    assert row["median_survival_s"] == 30 * 60.0


def test_median_survival_null_when_curve_stays_high(spark):
    # 1 early death among 9 long-lived CENSORED convs (each spans two
    # days and ends within 1h of the frontier): S(300s) = 0.9, never 0.5
    rows = []
    for i in range(9):
        rows.append((f"a{i}", "m", BASE, 0, 1.0))
        rows.append((f"a{i}", "m",
                     BASE + dt.timedelta(days=2, minutes=i), 1, 1.0))
    df = spark.createDataFrame(
        rows + [("d0", "m", BASE, 0, 1.0),
                ("d0", "m", BASE + dt.timedelta(minutes=5), 1, 1.0)],
        ["conv_id", "metric", "ts", "turn_idx", "value"],
    )
    out = median_survival(df).collect()[0]
    assert out["median_survival_s"] is None
    assert out["final_surv"] > 0.5


def _series(spark, rows):
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [(m, base + dt.timedelta(days=d), float(v)) for m, d, v in rows],
        ["metric", "ts", "value"],
    )


def test_kendall_w_perfect_concordance(spark):
    # every day ranks a < b < c -> W = 1
    rows = []
    for d in range(5):
        rows += [("a", d, 1.0 + d), ("b", d, 10.0 + d), ("c", d, 20.0 + d)]
    out = kendall_w(_series(spark, rows)).collect()[0]
    assert out["w"] == 1.0 and out["w_tiecorr"] == 1.0


def test_kendall_w_equals_q_over_nk1_when_tiefree(spark):
    rows = []
    vals = [[3, 1, 2], [1, 2, 3], [2, 3, 1], [3, 2, 1]]
    for d, day_vals in enumerate(vals):
        for m, v in zip("abc", day_vals):
            rows.append((m, d, float(v)))
    s = _series(spark, rows)
    w = kendall_w(s).collect()[0]
    q = friedman_test(s).collect()[0]
    n, k = q["n_days"], q["k_raters"]
    assert w["tie_term"] == 0
    assert w["w"] == pytest.approx(q["q_stat"] / (n * (k - 1)), abs=1e-6)
    assert 0.0 <= w["w"] <= 1.0

"""Cohort LTV curves."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.retention import cohort_ltv

MON = dt.datetime(2026, 1, 5)  # a Monday


def _events(spark, rows):
    # rows: (user, day_offset, value)
    return spark.createDataFrame(
        [(int(u), MON + dt.timedelta(days=d), float(v))
         for u, d, v in rows],
        ["user_id", "ts", "value"],
    )


def test_cohort_ltv_hand_curve(spark):
    # cohort of 2 users starting week 0; u1 spends 10 then 30,
    # u2 spends 20 in week 0 only
    rows = [(1, 0, 10.0), (2, 1, 20.0), (1, 7, 30.0)]
    out = {
        (r["cohort_week"], r["age_week"]): r
        for r in cohort_ltv(_events(spark, rows)).collect()
    }
    k0 = [k for k in out if k[1] == 0][0]
    k1 = [k for k in out if k[1] == 1][0]
    assert out[k0]["cohort_size"] == 2
    assert out[k0]["active_users"] == 2
    assert out[k0]["cum_value_per_user"] == pytest.approx(15.0)
    assert out[k1]["active_users"] == 1
    assert out[k1]["cum_value_per_user"] == pytest.approx(30.0)


def test_cohort_ltv_cumulative_monotone(spark):
    rows = []
    for u in range(6):
        for wk in range(4):
            rows.append((u, 7 * wk + u % 5, 5.0 + u))
    curves = {}
    for r in cohort_ltv(_events(spark, rows)).collect():
        curves.setdefault(r["cohort_week"], []).append(
            (r["age_week"], r["cum_value_per_user"])
        )
    for pts in curves.values():
        pts.sort()
        vals = [v for _, v in pts]
        assert all(b >= a for a, b in zip(vals, vals[1:]))


def test_cohort_ltv_separate_cohorts(spark):
    # u1 starts week 0, u2 starts week 2 -> two cohorts of size 1
    rows = [(1, 0, 10.0), (2, 14, 50.0)]
    out = cohort_ltv(_events(spark, rows)).collect()
    assert len(out) == 2
    assert all(r["cohort_size"] == 1 and r["age_week"] == 0 for r in out)

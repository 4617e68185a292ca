"""l-diversity (privacy), category churn (DQ), and Newey-West HAC SE
(tsdiag): hand fixtures with exact known answers."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.dq import category_churn
from timeseriescorrelation_spark.operators.privacy import (
    l_diversity,
    t_closeness,
)
from timeseriescorrelation_spark.operators.tsdiag import newey_west

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def test_l_diversity_hand_counts(spark):
    # group (en, a): 10 rows, ONE sensitive value -> leaks
    # group (fr, b): 6 rows, THREE sensitive values
    rows = [("en", "a", 100)] * 10 + [
        ("fr", "b", 100), ("fr", "b", 100),
        ("fr", "b", 200), ("fr", "b", 200),
        ("fr", "b", 300), ("fr", "b", 300),
    ]
    df = spark.createDataFrame(rows, "lang string, source string, sv int")
    out = {
        r.l: r
        for r in l_diversity(
            df, ["lang", "source"], F.col("sv"), ls=[2, 3, 5]
        ).collect()
    }
    assert out[2].n_groups == 2
    assert out[2].n_groups_below == 1 and out[2].n_rows_below == 10
    assert out[2].pct_rows_below == pytest.approx(10 / 16, abs=2e-6)
    assert out[3].n_groups_below == 1  # 3 distinct >= 3 passes
    assert out[5].n_groups_below == 2 and out[5].n_rows_below == 16


def test_t_closeness_hand_tvd(spark):
    # global sensitive dist: {100: 5, 200: 5} over n=10.
    # (en, a): 4 rows all 100 -> dist {1, 0},  TVD = 0.5
    # (fr, b): 4 rows all 200 -> dist {0, 1},  TVD = 0.5
    # (de, c): 1 row each     -> dist {.5,.5}, TVD = 0.0
    rows = (
        [("en", "a", 100)] * 4
        + [("fr", "b", 200)] * 4
        + [("de", "c", 100), ("de", "c", 200)]
    )
    df = spark.createDataFrame(rows, "lang string, source string, sv int")
    out = {
        round(r.t, 1): r
        for r in t_closeness(
            df, ["lang", "source"], F.col("sv"), ts10=[2, 3, 5]
        ).collect()
    }
    for t in (0.2, 0.3, 0.5):
        assert out[t].n_groups == 3
        assert out[t].max_tvd == pytest.approx(0.5, abs=2e-6)
    # TVD 0.5 exceeds t=0.2 and t=0.3 for the two pure groups,
    # but 0.5 > 0.5 is false (strict integer comparison).
    assert out[0.2].n_groups_above == 2 and out[0.2].n_rows_above == 8
    assert out[0.2].pct_rows_above == pytest.approx(0.8, abs=2e-6)
    assert out[0.3].n_groups_above == 2
    assert out[0.5].n_groups_above == 0 and out[0.5].n_rows_above == 0


def test_category_churn_hand_days(spark):
    rows = []

    def day(d, cats):
        for cat, n in cats.items():
            for i in range(n):
                rows.append(
                    (1000 + i, T0 + dt.timedelta(days=d, hours=i % 20),
                     7, cat, 1.0)
                )

    day(0, {"A": 5, "B": 3})
    day(1, {"A": 4, "C": 6})   # B dropped, C new carrying 6/10 rows
    day(2, {"A": 2, "C": 2})   # no churn
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {r.day_ts: r for r in category_churn(df).collect()}
    assert len(out) == 2  # day 0 has no baseline
    d1 = out[T0 + dt.timedelta(days=1)]
    assert d1.n_cats == 2 and d1.n_new == 1 and d1.n_dropped == 1
    assert d1.new_rows == 6
    assert d1.new_rows_share == pytest.approx(0.6, abs=2e-6)
    d2 = out[T0 + dt.timedelta(days=2)]
    assert d2.n_new == 0 and d2.n_dropped == 0 and d2.new_rows == 0


def _nw_expected(cents, max_lag=6, scale=100):
    n = len(cents)
    s = sum(cents)

    def c_k(k):
        p = sum(cents[i] * cents[i + k] for i in range(n - k))
        a = sum(cents[: n - k])
        b = sum(cents[k:])
        return n * n * p - n * s * (a + b) + (n - k) * s * s

    c0 = c_k(0)
    vp = (max_lag + 1) * c0
    for k in range(1, max_lag + 1):
        vp += 2 * (max_lag + 1 - k) * c_k(k)
    nd = float(n)
    den = nd * nd * float(scale)
    return (
        math.sqrt(float(c0)) / den,
        math.sqrt(float(vp) / (max_lag + 1.0)) / den,
        math.sqrt(float(vp) / ((max_lag + 1.0) * float(c0))),
    )


def _series(spark, vals):
    return spark.createDataFrame(
        [
            ("c", "m", T0 + dt.timedelta(hours=i), i, float(v))
            for i, v in enumerate(vals)
        ],
        SERIES_SCHEMA,
    )


def test_newey_west_blocky_inflates_se(spark):
    # long same-level runs -> positive autocorrelation -> HAC SE must
    # exceed the i.i.d. SE; values match the closed form exactly
    vals = ([10.0] * 8 + [20.0] * 8) * 3
    r = newey_west(_series(spark, vals)).collect()
    assert len(r) == 1
    row = r[0]
    cents = [round(v * 100) for v in vals]
    se_iid, se_hac, ratio = _nw_expected(cents)
    assert row.se_iid == pytest.approx(se_iid, abs=2e-6)
    assert row.se_hac == pytest.approx(se_hac, abs=2e-6)
    assert row.hac_ratio == pytest.approx(ratio, abs=2e-6)
    assert row.hac_ratio > 1.5


def test_newey_west_alternating_deflates_se(spark):
    # strict alternation -> negative lag-1 autocorrelation -> the
    # i.i.d. SE OVERSTATES the uncertainty of the mean -> ratio < 1
    vals = [10.0 if i % 2 == 0 else 20.0 for i in range(48)]
    r = newey_west(_series(spark, vals)).collect()
    assert len(r) == 1 and r[0].hac_ratio < 0.7


def test_newey_west_constant_drops(spark):
    assert newey_west(_series(spark, [5.0] * 48)).count() == 0

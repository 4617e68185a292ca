"""Agreement family: ICC(1), Cronbach's α, Friedman, Cohen's κ —
hand-computed small cases + structural invariants."""

from __future__ import annotations

import datetime as dt

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.agreement import (
    cohen_kappa,
    cronbach_alpha,
    friedman_test,
    icc_oneway,
)


def _series(spark, rows):
    """rows: (metric, day_offset, value)."""
    base = dt.datetime(2026, 1, 1)
    return spark.createDataFrame(
        [
            (m, base + dt.timedelta(days=d), float(v))
            for m, d, v in rows
        ],
        ["metric", "ts", "value"],
    )


def test_icc_perfect_agreement_is_one(spark):
    # every metric reports the SAME value each day -> msw = 0, icc = 1
    rows = [
        (m, d, v)
        for d, v in [(0, 10.0), (1, 20.0), (2, 15.0), (3, 40.0)]
        for m in ["a", "b", "c"]
    ]
    out = icc_oneway(_series(spark, rows)).collect()[0]
    assert out["k_raters"] == 3 and out["n_days"] == 4
    assert out["msw"] == 0.0
    assert out["icc1"] == 1.0


def test_icc_matches_hand_anova(spark):
    # 2 raters x 3 days, hand ANOVA on cents
    # day sums S_i (cents): 300+320=620, 500+480=980, 100+140=240
    rows = [("a", 0, 3.0), ("b", 0, 3.2),
            ("a", 1, 5.0), ("b", 1, 4.8),
            ("a", 2, 1.0), ("b", 2, 1.4)]
    out = icc_oneway(_series(spark, rows)).collect()[0]
    n, k = 3, 2
    xs = [300, 320, 500, 480, 100, 140]
    s = [620, 980, 240]
    t = sum(xs)
    ssb = sum(v * v for v in s) / k - t * t / (n * k)
    ssw = sum(v * v for v in xs) - sum(v * v for v in s) / k
    msb, msw = ssb / (n - 1), ssw / (n * (k - 1))
    icc = (msb - msw) / (msb + (k - 1) * msw)
    assert out["grand_total"] == t
    assert out["msb"] == pytest.approx(msb / 1e4, abs=2e-6)
    assert out["msw"] == pytest.approx(msw / 1e4, abs=2e-6)
    assert out["icc1"] == pytest.approx(icc, abs=2e-6)


def test_icc_incomplete_days_dropped(spark):
    rows = [("a", 0, 1.0), ("b", 0, 1.0),
            ("a", 1, 2.0), ("b", 1, 2.0),
            ("a", 2, 9.0)]  # day 2 missing metric b -> dropped
    out = icc_oneway(_series(spark, rows)).collect()[0]
    assert out["n_days"] == 2
    assert out["grand_total"] == 600


def test_cronbach_identical_items_alpha_one(spark):
    rows = [
        (m, d, v)
        for d, v in [(0, 1.0), (1, 7.0), (2, 4.0), (3, 2.5)]
        for m in ["a", "b", "c", "d"]
    ]
    out = cronbach_alpha(_series(spark, rows)).collect()[0]
    assert out["k_items"] == 4 and out["n_days"] == 4
    assert out["alpha"] == 1.0


def test_cronbach_matches_hand_formula(spark):
    rows = [("a", 0, 1.0), ("b", 0, 2.0),
            ("a", 1, 2.0), ("b", 1, 1.0),
            ("a", 2, 3.0), ("b", 2, 3.5)]
    out = cronbach_alpha(_series(spark, rows)).collect()[0]
    import statistics

    a = [100, 200, 300]
    b = [200, 100, 350]
    tot = [x + y for x, y in zip(a, b)]
    ivs = statistics.variance(a) + statistics.variance(b)
    tv = statistics.variance(tot)
    alpha = 2 / 1 * (1 - ivs / tv)
    assert out["item_var_sum"] == pytest.approx(ivs / 1e4, abs=2e-6)
    assert out["total_var"] == pytest.approx(tv / 1e4, abs=2e-6)
    assert out["alpha"] == pytest.approx(alpha, abs=2e-6)


def test_friedman_constant_ranking_max_q(spark):
    # metric c always highest, b middle, a lowest -> maximal Q for
    # k=3: Q = 12n/(k(k+1)) * sum over j of (rbar_j - 2)^2 = n*(1+0+1)*12/12 = 2n
    n = 5
    rows = []
    for d in range(n):
        rows += [("a", d, 1.0 + d), ("b", d, 10.0 + d), ("c", d, 20.0 + d)]
    out = friedman_test(_series(spark, rows)).collect()[0]
    assert out["tie_term"] == 0
    assert out["q_stat"] == pytest.approx(2.0 * n, abs=1e-6)
    assert out["q_tiecorr"] == out["q_stat"]


def test_friedman_all_tied_q_zero_corr_null(spark):
    rows = [
        (m, d, 5.0) for d in range(3) for m in ["a", "b"]
    ]
    out = friedman_test(_series(spark, rows)).collect()[0]
    # every day fully tied: doubled ranks all equal n(k+1) -> dev2 = 0
    assert out["dev2"] == 0 and out["q_stat"] == 0.0
    # C = 1 - n*(k^3-k)/(n*k*(k^2-1)) = 0 -> corrected Q undefined
    assert out["q_tiecorr"] is None


def test_friedman_tie_ranks_average(spark):
    # day 0: a=b < c -> doubled ranks a,b = 2*0+2+1 = 3 (avg 1.5),
    # c = 2*2+1+1 = 6 (rank 3 doubled)
    rows = [("a", 0, 1.0), ("b", 0, 1.0), ("c", 0, 2.0),
            ("a", 1, 1.0), ("b", 1, 2.0), ("c", 1, 3.0)]
    out = friedman_test(_series(spark, rows)).collect()[0]
    # R2: a = 3+2=5, b = 3+4=7, c = 6+6=12; n(k+1)=8 -> dev2 = 9+1+16=26
    assert out["dev2"] == 26
    assert out["tie_term"] == 2 ** 3 - 2


def _events(spark, rows):
    """rows: (hour_offset, user_id, n_copies)."""
    base = dt.datetime(2026, 1, 1)
    data = []
    for h, uid, copies in rows:
        for c in range(copies):
            data.append(
                (base + dt.timedelta(hours=h, minutes=c), int(uid))
            )
    return spark.createDataFrame(data, ["ts", "user_id"])


def test_kappa_identical_raters_is_one(spark):
    # n_users == n_events per hour (one event per distinct user), and
    # hour volumes all distinct -> both raters band identically
    rows = []
    for h in range(9):
        rows += [(h, u, 1) for u in range(h + 1)]
    out = cohen_kappa(_events(spark, rows)).collect()[0]
    assert out["n_subjects"] == 9
    assert out["po"] == 1.0
    assert out["kappa"] == 1.0


def test_kappa_decoupled_raters_below_one(spark):
    # hours where event volume rises while distinct users FALL ->
    # rater A (events) and rater B (users) order hours oppositely
    rows = []
    for h in range(9):
        # h events-band grows with h; users shrink with h
        n_users = 9 - h
        rows += [(h, u, 1) for u in range(n_users)]     # 1 ev/user
        rows += [(h, 0, h * 3)]                          # extra from u0
    out = cohen_kappa(_events(spark, rows)).collect()[0]
    assert out["kappa"] < 0.5
    assert 0.0 <= out["po"] <= 1.0 and 0.0 < out["pe"] < 1.0


def test_kappa_plan_has_no_global_window(spark):
    from timeseriescorrelation_spark.plans.audit import audit_plan

    rows = [(h, u, 1) for h in range(5) for u in range(h + 1)]
    df = cohen_kappa(_events(spark, rows))
    assert audit_plan(df) == []

"""Semantic checks for the round-3 drift / cross-metric operators on
hand-computed synthetics (the oracle gate covers cross-engine equality;
these pin the MATH)."""

from __future__ import annotations

import datetime as dt
import math

from pyspark.sql import functions as F

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)
SCHEMA = (
    "conv_id string, metric string, ts timestamp, "
    "turn_idx int, value double"
)


def _series(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _pt(metric, minutes, turn, v):
    return ("c", metric, T0 + dt.timedelta(minutes=minutes), turn, float(v))


def test_changepoint_finds_level_shift(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        changepoint_daily,
    )

    # 6 points at 1.0 then 6 points at 5.0 — split must land on the
    # last low point, means exactly 1.0 / 5.0
    rows = [_pt("m", i * 10, i, 1.0) for i in range(6)]
    rows += [_pt("m", 60 + i * 10, 6 + i, 5.0) for i in range(6)]
    got = changepoint_daily(_series(spark, rows), min_n=8).collect()
    assert len(got) == 1
    r = got[0]
    assert r.split_ts == T0 + dt.timedelta(minutes=50)
    assert r.mean_left == 1.0 and r.mean_right == 5.0
    # gain = between-segment SS = n1*n2/n*(d)^2 = 6*6/12*16 = 48
    assert r.gain_ss == 48.0


def test_changepoint_flat_day_gain_zero(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        changepoint_daily,
    )

    rows = [_pt("m", i * 5, i, 2.0) for i in range(10)]
    r = changepoint_daily(_series(spark, rows), min_n=8).collect()[0]
    assert r.gain_ss == 0.0
    # tie on gain resolves to the smallest k -> first point
    assert r.split_ts == T0


def test_ks_drift_identical_vs_disjoint(spark):
    from timeseriescorrelation_spark.operators.drift import ks_drift_daily

    day2 = 24 * 60
    # day1 == day2 distribution -> D = 0; day3 disjoint from day2 -> D = 1
    rows = [_pt("m", i, i, float(i % 10)) for i in range(20)]
    rows += [_pt("m", day2 + i, i, float(i % 10)) for i in range(20)]
    rows += [_pt("m", 2 * day2 + i, i, 100.0 + i) for i in range(20)]
    got = {
        r.day_ts.day: r.d_stat
        for r in ks_drift_daily(_series(spark, rows), min_n=8).collect()
    }
    assert got[2] == 0.0
    assert got[3] == 1.0


def test_granger_gain_detects_lagged_copy(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        granger_gain,
    )

    # y's hourly sum is EXACTLY x's previous hour; y itself is serially
    # uncorrelated noise-ish -> gain(x->y) should be large, and the
    # reverse direction should not be perfect
    import random

    rng = random.Random(7)
    xs = [rng.randint(1, 100) for _ in range(80)]
    rows = []
    for h, x in enumerate(xs):
        rows.append(_pt("x", h * 60, h, float(x)))
        if h > 0:
            rows.append(("c", "y", T0 + dt.timedelta(hours=h), h,
                         float(xs[h - 1])))
    got = {
        (r.metric_x, r.metric_y): r
        for r in granger_gain(_series(spark, rows), min_n=24).collect()
    }
    fwd = got[("x", "y")]
    assert fwd.r2_full is not None and fwd.r2_full > 0.999
    assert fwd.gain > 0.5


def test_entropy_uniform_and_degenerate(spark):
    from timeseriescorrelation_spark.operators.drift import entropy_daily

    rows = []
    for i in range(40):
        rows.append((i, T0 + dt.timedelta(minutes=i), 1,
                     "abcd"[i % 4], 1.0, "{}"))
    day2 = T0 + dt.timedelta(days=1)
    for i in range(40):
        rows.append((100 + i, day2 + dt.timedelta(minutes=i), 1,
                     "a", 1.0, "{}"))
    ev = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    )
    got = {r.day_ts.day: r for r in entropy_daily(ev).collect()}
    assert abs(got[1].entropy_nats - math.log(4)) < 1e-5
    assert got[2].entropy_nats == 0.0
    assert got[1].n_types == 4 and got[2].n_types == 1


def test_benford_conforming_vs_uniform(spark):
    from timeseriescorrelation_spark.operators.drift import (
        BENFORD_P,
        benford_check,
    )

    rows = []
    # metric "good": counts proportional to Benford -> chi2 near 0
    n_tot = 1000
    i = 0
    for d, p in enumerate(BENFORD_P, start=1):
        for _ in range(round(p * n_tot)):
            rows.append(_pt("good", i % 1200, i, float(d)))
            i += 1
    # metric "flat": uniform first digits -> chi2 large
    for j in range(900):
        rows.append(_pt("flat", j, j, float(1 + j % 9)))
    got = {
        r.metric: r.chi2
        for r in benford_check(_series(spark, rows), min_n=50).collect()
    }
    assert got["good"] < 1.0
    assert got["flat"] > 100.0


def test_burst_flags_hot_hour_only(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        burst_hours,
    )

    rows = []
    t = 0
    # 24 calm hours (5 events each), then one hot hour (50 events)
    for h in range(24):
        for j in range(5):
            rows.append(_pt("m", h * 60 + j, t, 1.0))
            t += 1
    for j in range(50):
        rows.append(_pt("m", 24 * 60 + j, t, 1.0))
        t += 1
    got = burst_hours(_series(spark, rows), num=3, den=1,
                      min_count=10).collect()
    flagged = [r.hour_ts for r in got if r.burst]
    assert flagged == [T0 + dt.timedelta(hours=24)]
    # calm hours below min_count never flag even with zero history
    assert all((not r.burst) for r in got if r.cnt == 5)


def test_corr_matrix_perfect_anticorrelation(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        corr_matrix_daily,
    )

    rows = []
    for h in range(12):
        rows.append(_pt("a", h * 60, h, float(h + 1)))
        rows.append(_pt("b", h * 60, h, float(12 - h)))
    got = corr_matrix_daily(_series(spark, rows), min_hours=4).collect()
    assert len(got) == 1
    assert got[0].metric_a == "a" and got[0].metric_b == "b"
    assert got[0].r == -1.0 and got[0].n_hours == 12


def test_changepoints_multi_three_levels(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        changepoints_multi,
    )

    # three clean levels: 8 pts @1.0, 8 pts @5.0, 8 pts @9.0
    rows = []
    for s, lvl in enumerate([1.0, 5.0, 9.0]):
        for i in range(8):
            rows.append(_pt("m", s * 80 + i * 10, s * 8 + i, lvl))
    got = changepoints_multi(
        _series(spark, rows), max_splits=3, min_gain=0.5, min_seg=4
    ).collect()
    segs = sorted((r.seg_id, r.n, r.mean) for r in got)
    assert segs == [(1, 8, 1.0), (2, 8, 5.0), (3, 8, 9.0)]
    starts = {r.seg_id: r.seg_start_ts for r in got}
    assert starts[2] == T0 + dt.timedelta(minutes=80)
    assert starts[3] == T0 + dt.timedelta(minutes=160)


def test_changepoints_multi_flat_stays_one_segment(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        changepoints_multi,
    )

    rows = [_pt("m", i * 5, i, 3.0) for i in range(20)]
    got = changepoints_multi(
        _series(spark, rows), max_splits=3, min_gain=0.5, min_seg=4
    ).collect()
    assert len(got) == 1
    assert got[0].n == 20 and got[0].mean == 3.0


def test_changepoints_multi_respects_min_seg(spark):
    from timeseriescorrelation_spark.operators.changepoint import (
        changepoints_multi,
    )

    # true level shift after only 2 points: min_seg=4 forbids k<4, so
    # the accepted split is the constrained argmax k=4 (hand-computed:
    # gain(4)=426,666.67 cents² beats k=5..8) — every final segment
    # honors the 4-point floor even though the "real" cut would not
    rows = [_pt("m", i * 10, i, 1.0) for i in range(2)]
    rows += [_pt("m", 20 + i * 10, 2 + i, 9.0) for i in range(10)]
    got = changepoints_multi(
        _series(spark, rows), max_splits=2, min_gain=0.5, min_seg=4
    ).collect()
    assert sorted(r.n for r in got) == [4, 8]
    assert all(r.n >= 4 for r in got)


def test_mutual_info_identity_and_independence(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        mutual_information_pairs,
    )

    # 96 hourly points.  "a" and "b" are byte-identical series -> the
    # 4-bin joint is diagonal and MI = ln(4) exactly (24 per bin).
    # "x" cycles its quartile every hour and "z" every 4 hours so the
    # joint distribution is the exact product of marginals (6 = 24*24/96
    # in every cell) -> MI = 0 exactly.
    rows = []
    for h in range(96):
        v = float(h)
        rows.append(("c", "a", T0 + dt.timedelta(hours=h), h, v))
        rows.append(("c", "b", T0 + dt.timedelta(hours=h), h, v))
        rows.append(("c", "x", T0 + dt.timedelta(hours=h), h,
                     float(h % 4) * 10.0))
        rows.append(("c", "z", T0 + dt.timedelta(hours=h), h,
                     float((h // 4) % 4) * 10.0))
    got = {
        (r.metric_x, r.metric_y): r
        for r in mutual_information_pairs(_series(spark, rows)).collect()
    }
    assert abs(got[("a", "b")].mi_nats - math.log(4)) < 1e-5
    assert got[("x", "z")].mi_u == 0
    assert got[("a", "b")].n_hours == 96


def test_beta_daily_exact_affine(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        beta_daily,
    )

    # one point per hour; y = 2x + 5 in value units -> beta = 2,
    # alpha = 5 exactly (the hourly cent sums inherit the affine map)
    rows = []
    for h in range(12):
        x = float(10 + h)
        rows.append(_pt("x", h * 60, h, x))
        rows.append(("c", "y", T0 + dt.timedelta(hours=h), h, 2 * x + 5))
    got = {
        (r.metric_x, r.metric_y): r
        for r in beta_daily(_series(spark, rows), min_hours=6).collect()
    }
    assert got[("x", "y")].beta == 2.0
    assert got[("x", "y")].alpha == 5.0
    # reverse direction inverts the slope: x = 0.5y - 2.5
    assert got[("y", "x")].beta == 0.5
    assert got[("y", "x")].alpha == -2.5


def test_js_drift_zero_on_identical_bounded_on_disjoint(spark):
    from timeseriescorrelation_spark.operators.drift import js_drift_daily

    rows = []
    # days 1 and 2 identical value mix -> every bin matches -> JS = 0
    for d in (0, 1):
        for i in range(50):
            rows.append(_pt("m", d * 24 * 60 + i, i, float(i % 10)))
    # day 3 disjoint from day 2 (all values above every edge)
    for i in range(50):
        rows.append(_pt("m", 2 * 24 * 60 + i, i, 500.0 + i))
    got = {r.day_ts.day: r for r in js_drift_daily(_series(spark, rows)
                                                   ).collect()}
    assert got[2].js_u == 0
    assert 0.3 < got[3].js_nats <= 0.693148
    assert got[3].n_today == 50 and got[3].n_base == 50


def test_lead_lag_finds_exact_shift(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        lead_lag_best,
    )

    import random

    rng = random.Random(11)
    xs = [float(rng.randint(1, 100)) for _ in range(60)]
    rows = []
    for h, x in enumerate(xs):
        rows.append(_pt("a", h * 60, h, x))
        # b at hour h repeats a's value from 2 hours earlier ->
        # corr(a_t, b_{t+2}) = 1 exactly, best lag = +2
        if h >= 2:
            rows.append(("c", "b", T0 + dt.timedelta(hours=h), h,
                         xs[h - 2]))
    out = lead_lag_best(_series(spark, rows), max_lag_h=3,
                        min_n=24).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.metric_x, r.metric_y, r.best_lag_h, r.r) == ("a", "b", 2, 1.0)


def test_emd_drift_zero_identical_exact_on_full_shift(spark):
    from timeseriescorrelation_spark.operators.drift import emd_drift_daily

    rows = []
    # days 1 and 2: identical uniform mix over 10 distinct values ->
    # every cumulative bin matches -> EMD = 0 exactly
    for d in (0, 1):
        for i in range(50):
            rows.append(_pt("m", d * 24 * 60 + i, i, float(i % 10)))
    # day 3: every value above all of day 2's decile edges -> all mass
    # lands in bin 10 while the base is 5-per-bin uniform, so
    # EMD = (1/10)*sum_{i=1..9} i/10 = 0.45 exactly
    for i in range(50):
        rows.append(_pt("m", 2 * 24 * 60 + i, i, 500.0 + i))
    got = {r.day_ts.day: r for r in emd_drift_daily(_series(spark, rows)
                                                    ).collect()}
    assert got[2].emd == 0.0
    assert got[3].emd == 0.45
    assert got[3].n_today == 50 and got[3].n_base == 50


def test_markov_entropy_deterministic_vs_iid(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        markov_entropy_daily,
    )

    schema = "event_id long, ts timestamp, user_id long, event_type string"
    rows = []
    # day 1: deterministic alternation a,b,a,b,... -> H(next|prev)=0,
    # H(next)=ln 2, info gain = ln 2
    for i in range(40):
        rows.append((i, T0 + dt.timedelta(minutes=i), 1,
                     "a" if i % 2 == 0 else "b"))
    # day 2, separate user (no boundary-crossing lag): "aabb"*10 + "a"
    # gives 40 transitions with all four (prev,next) cells = 10, so
    # P(next|prev) == P(next) == 1/2 exactly -> info gain = 0
    base = 24 * 60
    pat = "aabb" * 10 + "a"
    for i, ch in enumerate(pat):
        rows.append((100 + i, T0 + dt.timedelta(minutes=base + i), 2, ch))
    got = {r.day_ts.day: r
           for r in markov_entropy_daily(
               spark.createDataFrame(rows, schema)).collect()}
    ln2 = round(math.log(2), 6)
    # day 1: 39 transitions, next marginal (20, 19)
    h1 = math.log(39) - (20 * math.log(20) + 19 * math.log(19)) / 39
    assert got[1].h_cond_nats == 0.0
    assert abs(got[1].h_next_nats - h1) < 2e-6
    assert got[1].info_gain_nats == got[1].h_next_nats
    assert got[2].n_transitions == 40
    assert got[2].h_next_nats == ln2
    assert got[2].h_cond_nats == ln2
    assert got[2].info_gain_nats == 0.0


def test_moments_match_population_formulas(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        moments_daily,
    )

    import numpy as np

    vals = [1.0, 2.0, 3.0, 4.0, 10.0]
    rows = [_pt("m", i, i, v) for i, v in enumerate(vals)]
    r = moments_daily(_series(spark, rows)).collect()[0]
    x = np.array(vals)
    m = x.mean()
    m2 = ((x - m) ** 2).mean()
    m3 = ((x - m) ** 3).mean()
    m4 = ((x - m) ** 4).mean()
    assert r.n == 5
    assert r.mean == round(m, 6)
    assert abs(r.std - math.sqrt(m2)) < 1e-6
    assert abs(r.skew_g1 - m3 / m2 ** 1.5) < 1e-6
    assert abs(r.kurt_excess - (m4 / m2 ** 2 - 3)) < 1e-6


def test_ols2_matches_numpy_lstsq(spark):
    """ols2_daily's Cramer solve on exact decimal moments equals
    numpy's least-squares fit on the same (hourly cent) design."""
    import numpy as np

    from timeseriescorrelation_spark.operators.crossmetric import (
        ols2_daily,
    )

    base = dt.datetime(2024, 3, 1)
    rng = np.random.RandomState(7)
    x1 = rng.randint(100, 5000, size=24)
    x2 = rng.randint(100, 5000, size=24)
    noise = rng.randint(-200, 200, size=24)
    y = 300 + 2 * x1 - x2 + noise  # cents
    rows = []
    for h in range(24):
        ts = base + dt.timedelta(hours=h)
        rows.append(("c", "y", ts, h, float(y[h]) / 100))
        rows.append(("c", "x1", ts, h, float(x1[h]) / 100))
        rows.append(("c", "x2", ts, h, float(x2[h]) / 100))
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    out = ols2_daily(df, "y", "x1", "x2").collect()
    assert len(out) == 1
    r = out[0]
    A = np.column_stack([np.ones(24), x1, x2])
    coef, *_ = np.linalg.lstsq(A, y.astype(float), rcond=None)
    assert abs(r.b0 - coef[0] / 100) < 1e-4  # b0 descaled to value units
    assert abs(r.b1 - coef[1]) < 1e-4
    assert abs(r.b2 - coef[2]) < 1e-4
    assert 0.9 < r.r2 <= 1.0
    # collinear design -> NULL, not inf
    rows2 = [t for t in rows if t[1] != "x2"] + [
        ("c", "x2", base + dt.timedelta(hours=h), h, float(x1[h]) / 100)
        for h in range(24)
    ]
    df2 = spark.createDataFrame(
        rows2, "conv_id string, metric string, ts timestamp, "
               "turn_idx int, value double")
    r2 = ols2_daily(df2, "y", "x1", "x2").collect()[0]
    assert r2.b1 is None and r2.b2 is None

"""Correlation-family extensions (ccc, deseasonalized, winsorized,
rank churn): hand fixtures with exact expected values — CCC charging
for scale offsets, shared seasonality cancelling to exactly zero,
outliers clipped by order statistics, deterministic leaderboards."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.activity import rank_churn
from timeseriescorrelation_spark.operators.crossmetric import (
    ccc_pairs,
    corr_deseasonalized,
    corr_winsorized,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, by_metric):
    rows = []
    for metric, values in by_metric.items():
        for i, v in enumerate(values):
            rows.append(
                ("c", metric, T0 + dt.timedelta(hours=i), i, float(v))
            )
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _ccc_expected(xa, xb):
    n = len(xa)
    sa, sb = sum(xa), sum(xb)
    saa = sum(v * v for v in xa)
    sbb = sum(v * v for v in xb)
    sab = sum(a * b for a, b in zip(xa, xb))
    num = n * sab - sa * sb
    den = (n * saa - sa * sa) + (n * sbb - sb * sb) + (sa - sb) ** 2
    return 2.0 * float(num) / float(den)


def test_ccc_identity_is_one_offset_is_less(spark):
    base = [float(10 + (i * 7) % 13) for i in range(30)]
    same = dict(a=base, b=base)
    r1 = ccc_pairs(_mk(spark, same)).collect()[0]
    assert r1.r == 1.0 and r1.ccc == 1.0
    # y = x + 5: Pearson forgives the offset, CCC must not
    shifted = dict(a=base, b=[v + 5 for v in base])
    r2 = ccc_pairs(_mk(spark, shifted)).collect()[0]
    assert r2.r == 1.0
    ca = [round(v * 100) for v in base]
    cb = [round((v + 5) * 100) for v in base]
    assert r2.ccc == pytest.approx(_ccc_expected(ca, cb), abs=2e-6)
    assert r2.ccc < 1.0


def test_deseasonalized_shared_profile_cancels(spark):
    # both metrics share a strong hour-of-day profile; residual signs
    # are orthogonal by construction -> raw r ~ 1 but r_deseason == 0
    prof = [100.0 * (h + 1) for h in range(24)]
    a, b = [], []
    for d in range(2):
        for h in range(24):
            ra = 1.0 if d == 0 else -1.0
            rb = 1.0 if (d + h) % 2 == 0 else -1.0
            a.append(prof[h] + ra)
            b.append(prof[h] + rb)
    df = _mk(spark, {"a": a, "b": b})
    raw = ccc_pairs(df).collect()[0]
    assert raw.r > 0.999  # the shared profile dominates
    des = corr_deseasonalized(df).collect()
    assert len(des) == 1
    assert des[0].r_deseason == 0.0  # exact: residual cov telescopes


def test_deseasonalized_shared_residual_is_one(spark):
    prof = [100.0 * (h + 1) for h in range(24)]
    a, b = [], []
    for d in range(2):
        for h in range(24):
            r = 1.0 if d == 0 else -1.0
            a.append(prof[h] + r)
            b.append(2000.0 + r)  # flat profile, SAME residual
    df = _mk(spark, {"a": a, "b": b})
    des = corr_deseasonalized(df).collect()[0]
    assert des.r_deseason == 1.0


def _wins_expected(ca, cb, pct=5):
    def clip(x):
        n = len(x)
        k_lo = (pct * n) // 100 + 1
        k_hi = n - (pct * n) // 100
        srt = sorted(x)
        lo, hi = srt[k_lo - 1], srt[k_hi - 1]
        return [min(max(v, lo), hi) for v in x]

    xa, xb = clip(ca), clip(cb)
    n = len(xa)
    sa, sb = sum(xa), sum(xb)
    saa = sum(v * v for v in xa)
    sbb = sum(v * v for v in xb)
    sab = sum(a * b for a, b in zip(xa, xb))
    num = float(n * sab - sa * sb)
    da, db = float(n * saa - sa * sa), float(n * sbb - sb * sb)
    return num / math.sqrt(da) / math.sqrt(db)


def test_winsorized_survives_outlier(spark):
    # perfectly co-moving except one 100x spike in a: the raw Pearson
    # is dragged by the spike; winsorizing clips it at a's own p95
    a = [float(10 + i) for i in range(30)]
    b = [float(10 + i) for i in range(30)]
    a[13] = 5000.0
    b[13] = 23.0
    df = _mk(spark, {"a": a, "b": b})
    out = corr_winsorized(df).collect()
    assert len(out) == 1
    ca = [round(v * 100) for v in a]
    cb = [round(v * 100) for v in b]
    assert out[0].r_wins == pytest.approx(
        _wins_expected(ca, cb), abs=2e-6
    )
    assert out[0].r_wins > 0.9


def test_rank_churn_hand_days(spark):
    rows = []

    def day(d, cats):
        for cat, n in cats.items():
            for i in range(n):
                rows.append(
                    (1, T0 + dt.timedelta(days=d, hours=i % 20),
                     7, cat, 1.0)
                )

    day(0, {"A": 5, "B": 3, "C": 1})
    day(1, {"A": 2, "B": 6, "C": 1, "D": 1})
    df = spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double",
    )
    out = {
        (r.day_ts, r.cat): r for r in rank_churn(df).collect()
    }
    d1 = T0 + dt.timedelta(days=1)
    assert all(k[0] == d1 for k in out)  # day 0 has no baseline
    assert out[(d1, "B")].rank_today == 1
    assert out[(d1, "B")].rank_delta == 1   # climbed 2 -> 1
    assert out[(d1, "A")].rank_delta == -1  # fell 1 -> 2
    # C and D tie at 1 row: tie breaks on name -> C before D
    assert out[(d1, "C")].rank_today == 3
    assert out[(d1, "D")].rank_today == 4
    assert out[(d1, "D")].rank_prev is None
    assert out[(d1, "D")].rank_delta is None


def _mk_daily(spark, by_metric):
    # one observation per DAY per metric (kendall runs on the day grid)
    rows = []
    for metric, values in by_metric.items():
        for i, v in enumerate(values):
            rows.append(
                ("c", metric, T0 + dt.timedelta(days=i), i, float(v))
            )
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def _tau_b_expected(xa, xb):
    n = len(xa)
    conc = disc = t1 = t2 = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xa[j] - xa[i]
            dy = xb[j] - xb[i]
            if dx == 0:
                t1 += 1
            if dy == 0:
                t2 += 1
            if dx * dy > 0:
                conc += 1
            elif dx * dy < 0:
                disc += 1
    n0 = n * (n - 1) // 2
    return (conc - disc) / math.sqrt((n0 - t1) * (n0 - t2))


def test_kendall_monotone_is_one_reversed_minus_one(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        kendall_tau_pairs,
    )

    up = [float(i * 3 + 1) for i in range(12)]
    down = list(reversed(up))
    curved = [float(v * v) for v in up]  # monotone transform of up
    df = _mk_daily(spark, dict(a=up, b=down, c=curved))
    out = {
        (r["metric_a"], r["metric_b"]): r["tau_b"]
        for r in kendall_tau_pairs(df, min_days=5).collect()
    }
    # tau is invariant under monotone transforms — Pearson is not
    assert out[("a", "c")] == pytest.approx(1.0)
    assert out[("a", "b")] == pytest.approx(-1.0)
    assert out[("b", "c")] == pytest.approx(-1.0)


def test_kendall_tie_correction_matches_bruteforce(spark):
    from timeseriescorrelation_spark.operators.crossmetric import (
        kendall_tau_pairs,
    )

    # deliberate value ties in both series (cents after *100)
    xa = [1, 2, 2, 3, 3, 3, 4, 5, 5, 6, 7, 7]
    xb = [2, 1, 3, 3, 2, 5, 4, 4, 6, 5, 8, 8]
    df = _mk_daily(spark, dict(a=[float(v) for v in xa],
                               b=[float(v) for v in xb]))
    row = kendall_tau_pairs(df, min_days=5).collect()[0]
    exp = _tau_b_expected([v * 100 for v in xa], [v * 100 for v in xb])
    assert row["tau_b"] == pytest.approx(exp, abs=1e-6)
    assert row["n_days"] == 12
    # ties keep |tau_b| strictly below 1 here, the -b correction's point
    assert abs(row["tau_b"]) < 1.0


def test_panel_fe_within_vs_pooled_sign_flip(spark):
    """Across-user levels are engineered so pooled OLS slope is
    NEGATIVE while every user's within-slope is +5 cents/event —
    the FE estimator must recover the within truth exactly."""
    from timeseriescorrelation_spark.operators.crossmetric import panel_fe

    # user u has base level (3-u)*1000 cents and x_ud events on day d;
    # y_ud = base_u + 5*x_ud cents  ->  within slope exactly 5.
    # Higher-x users get LOWER bases -> pooled slope negative.
    panel = {
        1: (3000, [1, 2, 3, 4]),
        2: (2000, [4, 5, 6, 7]),
        3: (1000, [7, 8, 9, 10]),
    }
    rows, eid = [], 0
    for u, (base, xs) in panel.items():
        for d, x in enumerate(xs):
            total_cents = base + 5 * x
            # x events on day d summing to total_cents: first event
            # carries the remainder, the rest 1 cent each
            cents = [total_cents - (x - 1)] + [1] * (x - 1)
            for i, c in enumerate(cents):
                rows.append((
                    eid,
                    dt.datetime(2024, 3, 1 + d, 12, 0, 0)
                    + dt.timedelta(seconds=i),
                    u, "e", c / 100.0, "{}",
                ))
                eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    r = panel_fe(df).collect()[0]
    assert r["n_obs"] == 12 and r["n_entities"] == 3
    assert r["beta"] == pytest.approx(5.0, abs=1e-5)
    assert r["r2_within"] == pytest.approx(1.0, abs=1e-5)

    # pooled slope really is negative (sanity of the construction)
    import numpy as np
    xs = np.array([x for _, (b, xl) in sorted(panel.items()) for x in xl])
    ys = np.array([
        b + 5 * x for _, (b, xl) in sorted(panel.items()) for x in xl
    ])
    assert np.polyfit(xs, ys, 1)[0] < 0

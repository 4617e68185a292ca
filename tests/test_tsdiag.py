"""Sequence diagnostics (operators/tsdiag): AR(2) Yule-Walker,
variance ratio, runs test, turning points, Allan variance,
Page-Hinkley — hand-built fixtures with the decisive edges (known
closed-form answers, constant/monotone degeneracies, level shift)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.tsdiag import (
    allan_variance,
    ar2_forecast,
    page_hinkley,
    runs_test,
    turning_points,
    variance_ratio,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, values, metric="m", start=T0, step_h=1):
    rows = []
    for i, v in enumerate(values):
        ts = start + dt.timedelta(hours=i * step_h)
        rows.append(("c", metric, ts, i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


# deterministic irregular-but-fixed cent series (one day, 24 hours)
VALS = [3.21, 1.05, 4.10, 1.50, 5.92, 2.60, 6.53, 3.50, 5.89, 7.93,
        2.38, 4.62, 6.43, 3.83, 2.79, 5.02, 8.84, 1.97, 6.93, 9.93,
        2.38, 4.46, 2.64, 3.38]
CENTS = [round(v * 100) for v in VALS]


def _ar2_expected(x):
    n = len(x)
    s = sum(x)

    def moments(k):
        p = sum(x[i] * x[i + k] for i in range(n - k))
        a = sum(x[: n - k])
        b = sum(x[k:])
        return p, a, b

    cs = []
    for k in (0, 1, 2):
        p, a, b = moments(k)
        cs.append(float(n * n * p - n * s * (a + b) + (n - k) * s * s))
    c0, c1, c2 = cs
    den = c0 * c0 - c1 * c1
    phi1 = c1 * (c0 - c2) / den
    phi2 = (c2 * c0 - c1 * c1) / den
    m = float(s) / float(n)
    fc = (m + phi1 * (x[-1] - m) + phi2 * (x[-2] - m)) / 100.0
    return c1 / c0, c2 / c0, phi1, phi2, fc


def test_ar2_matches_closed_form(spark):
    df = _mk(spark, VALS)
    r = ar2_forecast(df).collect()
    assert len(r) == 1
    row = r[0]
    r1, r2, phi1, phi2, fc = _ar2_expected(CENTS)
    assert row.n_hours == 24
    assert row.r1 == pytest.approx(r1, abs=2e-6)
    assert row.r2 == pytest.approx(r2, abs=2e-6)
    assert row.phi1 == pytest.approx(phi1, abs=2e-6)
    assert row.phi2 == pytest.approx(phi2, abs=2e-6)
    assert row.forecast == pytest.approx(fc, abs=2e-6)


def test_ar2_constant_series_drops(spark):
    # constant day -> C0 = 0 -> filtered out entirely
    df = _mk(spark, [5.0] * 24)
    assert ar2_forecast(df).count() == 0


def test_ar2_short_day_drops(spark):
    df = _mk(spark, VALS[:6])
    assert ar2_forecast(df).count() == 0


def test_variance_ratio_matches_closed_form(spark):
    df = _mk(spark, VALS)
    r = variance_ratio(df, q=4).collect()
    assert len(r) == 1
    x = CENTS
    d1 = [x[i] - x[i - 1] for i in range(1, len(x))]
    dq = [x[i] - x[i - 4] for i in range(4, len(x))]
    n1, nq = len(d1), len(dq)
    var1 = float(n1 * sum(d * d for d in d1) - sum(d1) ** 2)
    varq = float(nq * sum(d * d for d in dq) - sum(dq) ** 2)
    vr = varq * float(n1) * float(n1) / (
        4.0 * float(nq) * float(nq) * var1
    )
    assert r[0].n1 == n1 and r[0].nq == nq and r[0].q == 4
    assert r[0].vr == pytest.approx(vr, abs=2e-6)


def test_variance_ratio_smooth_wave_above_one(spark):
    # positively autocorrelated increments (triangle wave, runs of 4
    # same-sign steps) -> Var(4-step) > 4 x Var(1-step) -> VR > 1
    tri = [0.0, 1.0, 2.0, 3.0, 4.0, 3.0, 2.0, 1.0]
    vals = [10.0 + tri[i % 8] for i in range(24)]
    r = variance_ratio(_mk(spark, vals), q=4).collect()
    assert len(r) == 1 and r[0].vr > 1.0


def test_runs_alternating_is_max_runs(spark):
    # strict zigzag: every delta flips sign -> runs = pos + neg
    vals = [5.0 + (0.5 if i % 2 else 0.0) for i in range(13)]
    r = runs_test(_mk(spark, vals)).collect()
    assert len(r) == 1
    row = r[0]
    assert row.pos == 6 and row.neg == 6 and row.runs == 12
    p, m = 6.0, 6.0
    nn = p + m
    mu = 2.0 * p * m / nn + 1.0
    var = 2.0 * p * m * (2.0 * p * m - nn) / (nn * nn * (nn - 1.0))
    assert row.z == pytest.approx((12.0 - mu) / math.sqrt(var), abs=2e-6)


def test_runs_monotone_drops(spark):
    # all-positive deltas -> neg = 0 -> filtered
    assert runs_test(_mk(spark, [float(i) for i in range(16)])).count() == 0


def test_runs_zero_deltas_excluded(spark):
    # flats are dropped before sign sequencing (conditional-on-signs):
    # 1,1,2,2,1,1,2,2,... -> nonzero deltas alternate +1,-1,...
    vals = []
    for i in range(12):
        vals += [1.0 + (i % 2), 1.0 + (i % 2)]
    r = runs_test(_mk(spark, vals[:24])).collect()
    assert len(r) == 1
    assert r[0].pos + r[0].neg == 11 and r[0].runs == 11


def test_turning_points_zigzag_all_interior(spark):
    vals = [5.0 + (1.0 if i % 2 else 0.0) for i in range(24)]
    r = turning_points(_mk(spark, vals)).collect()
    assert len(r) == 1
    row = r[0]
    assert row.n_hours == 24 and row.tp == 22
    nd = 24.0
    mu = 2.0 * (nd - 2.0) / 3.0
    var = (16.0 * nd - 29.0) / 90.0
    assert row.z == pytest.approx((22.0 - mu) / math.sqrt(var), abs=2e-6)


def test_turning_points_monotone_zero(spark):
    r = turning_points(_mk(spark, [float(i) for i in range(24)])).collect()
    assert len(r) == 1 and r[0].tp == 0


def test_allan_constant_zero(spark):
    rows = allan_variance(_mk(spark, [7.0] * 48)).collect()
    assert {r.tau_h for r in rows} == {1, 2, 4}
    assert all(r.avar == 0.0 for r in rows)


def test_allan_alternating_closed_form(spark):
    # y alternates a, b hourly; tau=1: |dd| = b-a cents everywhere ->
    # avar = (b-a)^2 / (2 * scale^2); tau=2: every 2h bucket sums to
    # a+b -> dd = 0 -> avar = 0
    a, b = 2.00, 5.00
    vals = [a if i % 2 == 0 else b for i in range(48)]
    rows = {r.tau_h: r for r in allan_variance(_mk(spark, vals)).collect()}
    assert rows[1].m_pairs == 47
    assert rows[1].avar == pytest.approx(
        ((b - a) * 100) ** 2 / (2.0 * 100 * 100), abs=2e-6
    )
    assert rows[2].avar == 0.0
    assert rows[4].avar == 0.0


def test_allan_gap_excludes_pair(spark):
    # a missing hour breaks bucket adjacency: pairs spanning the gap
    # are excluded rather than spliced
    vals = [1.0] * 10
    df = _mk(spark, vals)
    df_gap = df.where("turn_idx != 5")
    rows = {r.tau_h: r for r in allan_variance(df_gap).collect()}
    # hours 0-4 and 6-9 remain: consecutive pairs = 4 + 3 = 7 (the
    # (4,6) pair spans the gap and is excluded)
    assert rows[1].m_pairs == 7


def test_page_hinkley_level_shift(spark):
    # 12 low hours then 12 high: m'_t = n*cum_t - t*S bottoms at the
    # shift point and recovers to 0 by t=n -> max excursion at the
    # last hour, value = |min m'| / (n * scale)
    x = [100] * 12 + [300] * 12  # cents
    vals = [c / 100.0 for c in x]
    r = page_hinkley(_mk(spark, vals)).collect()
    assert len(r) == 1
    row = r[0]
    n = len(x)
    s = sum(x)
    cum = 0
    mprimes = []
    for t, v in enumerate(x, start=1):
        cum += v
        mprimes.append(n * cum - t * s)
    best = max(
        m - min(mprimes[: i + 1]) for i, m in enumerate(mprimes)
    )
    assert row.n_hours == n
    assert row.ph_max == pytest.approx(best / (n * 100.0), abs=2e-6)
    # excursion is maximal (and first reaches the max) at the final hour
    assert row.ph_hour_ts == T0 + dt.timedelta(hours=23)


def test_page_hinkley_constant_zero(spark):
    r = page_hinkley(_mk(spark, [4.0] * 24)).collect()
    assert len(r) == 1 and r[0].ph_max == 0.0
    # ties on zero excursion -> earliest hour wins
    assert r[0].ph_hour_ts == T0


def test_jarque_bera_alternating_hand_value(spark):
    from timeseriescorrelation_spark.operators.tsdiag import jarque_bera

    # daily values 0,c,0,c,... -> deltas alternate +c/-c: g1 = 0,
    # two-point symmetric kurtosis m4/m2^2 = 1 -> g2 = -2,
    # JB = n/6 * (0 + 4/4) = n/6 = 1.0 at n=6, p = exp(-0.5)
    vals = [0.0, 5.0, 0.0, 5.0, 0.0, 5.0, 0.0]
    rows = [("c", "m", T0 + dt.timedelta(days=i), 0, v)
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = jarque_bera(df).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_deltas == 6
    assert r.skew_g1 == pytest.approx(0.0, abs=1e-9)
    assert r.kurt_excess == pytest.approx(-2.0, abs=1e-9)
    assert r.jb == pytest.approx(1.0, abs=1e-9)
    assert r.p_value == pytest.approx(math.exp(-0.5), abs=2e-6)


def test_jarque_bera_constant_deltas_null(spark):
    from timeseriescorrelation_spark.operators.tsdiag import jarque_bera

    # linear ramp -> all deltas equal -> B = 0 -> all stats NULL
    rows = [("c", "m", T0 + dt.timedelta(days=i), 0, float(i))
            for i in range(8)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = jarque_bera(df).collect()[0]
    assert r.n_deltas == 7
    assert r.jb is None and r.p_value is None


def test_jarque_bera_min_deltas_filter(spark):
    from timeseriescorrelation_spark.operators.tsdiag import jarque_bera

    rows = [("c", "m", T0 + dt.timedelta(days=i), 0, float(i % 2))
            for i in range(4)]  # 3 deltas < 6
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    assert jarque_bera(df).count() == 0


def _days(spark, values, metric="m"):
    rows = [("c", metric, T0 + dt.timedelta(days=i), 0, float(v))
            for i, v in enumerate(values)]
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_durbin_watson_alternating_resid_dw2(spark):
    from timeseriescorrelation_spark.operators.tsdiag import durbin_watson

    # y = t + r with r = [c,-c,-c,c,c,-c,-c,c]: sum r = 0 and
    # sum t*r = 0, so OLS fits slope 1/intercept 0 EXACTLY and the
    # residuals are r; DW = 16c^2/8c^2 = 2.0 (no autocorrelation)
    c = 3.0
    r = [c, -c, -c, c, c, -c, -c, c]
    y = [t + r[t] for t in range(8)]
    out = durbin_watson(_days(spark, y)).collect()
    assert len(out) == 1
    assert out[0].n_days == 8
    assert out[0].dw == pytest.approx(2.0, abs=1e-9)
    assert out[0].rho_lag1 == pytest.approx(0.0, abs=1e-9)


def test_durbin_watson_positive_autocorr_dw1(spark):
    from timeseriescorrelation_spark.operators.tsdiag import durbin_watson

    # r = [c,c,-c,-c,-c,-c,c,c]: sum r = 0, sum t*r = 0; diffs give
    # DW = 8c^2/8c^2 = 1.0 -> rho = 0.5 (positive autocorrelation)
    c = 2.0
    r = [c, c, -c, -c, -c, -c, c, c]
    y = [5.0 * t + r[t] for t in range(8)]
    out = durbin_watson(_days(spark, y)).collect()[0]
    assert out.dw == pytest.approx(1.0, abs=1e-9)
    assert out.rho_lag1 == pytest.approx(0.5, abs=1e-9)


def test_durbin_watson_perfect_line_null(spark):
    from timeseriescorrelation_spark.operators.tsdiag import durbin_watson

    out = durbin_watson(_days(spark, [2.0 * t + 1 for t in range(10)])
                        ).collect()[0]
    assert out.dw is None and out.rho_lag1 is None

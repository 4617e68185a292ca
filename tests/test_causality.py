"""Causality/co-movement screens (operators/causality, acf.pacf3):
cointegrated vs spurious pair fixtures for Engle-Granger, a driven
x->y chain for transfer entropy directionality, and Durbin-Levinson
consistency against the engine's own ACF rows."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.acf import acf_spectrum, pacf3
from timeseriescorrelation_spark.operators.causality import (
    engle_granger,
    transfer_entropy,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, by_metric):
    rows = []
    for metric, values in by_metric.items():
        for i, v in enumerate(values):
            if v is None:
                continue
            rows.append(
                ("c", metric, T0 + dt.timedelta(hours=i), i, float(v))
            )
    return spark.createDataFrame(rows, SERIES_SCHEMA)


# fixed pseudo-random walk increments (no RNG in tests)
STEPS = [1, -2, 3, 1, -1, -3, 2, 1, -1, 2, -2, 1, 3, -1, -2, 1,
         1, -3, 2, -1, 1, 2, -2, -1, 3, 1, -1, -2, 2, 1, -3, 1,
         2, -1, 1, -2, 3, -1, 1, 1, -2, 2, -1, 1, -3, 2, 1, -1]


def test_engle_granger_cointegrated_pair(spark):
    # x random walk, y = 2x + alternating +-0.02 stationary residual:
    # residual flips sign hourly -> rho_res near -1, df_stat strongly
    # negative, beta recovers 2
    x = [100.0]
    for s in STEPS:
        x.append(x[-1] + s)
    y = [2 * v + (0.02 if i % 2 else -0.02) for i, v in enumerate(x)]
    df = _mk(spark, {"x": x, "y": y})
    out = {
        (r.metric_x, r.metric_y): r for r in engle_granger(df).collect()
    }
    r = out[("x", "y")]
    assert r.n_hours == len(x)
    assert r.beta == pytest.approx(2.0, abs=0.01)
    assert r.rho_res < -0.8
    assert r.df_stat < -50


def test_engle_granger_spurious_pair(spark):
    # two deterministic trends with different curvature: regressing
    # one on the other leaves a smooth U-shaped residual whose lag-1
    # autocorrelation is near +1 -> unit-root-ish -> spurious flag
    n = 60
    x = [float(t) for t in range(n)]
    y = [float(t) * t / 10.0 for t in range(n)]
    df = _mk(spark, {"x": x, "y": y})
    out = {
        (r.metric_x, r.metric_y): r for r in engle_granger(df).collect()
    }
    r = out[("x", "y")]
    assert r.rho_res > 0.9
    assert r.df_stat > -10


def test_engle_granger_perfect_fit_drops(spark):
    # y = 3x exactly -> all residual micro-units 0 -> s11 = 0 -> row
    # filtered rather than a 0/0
    x = [100.0 + s for s in range(50)]
    y = [3 * v for v in x]
    df = _mk(spark, {"x": x, "y": y})
    out = {(r.metric_x, r.metric_y) for r in engle_granger(df).collect()}
    assert ("x", "y") not in out


LEVELS = [10.0, 20.0, 30.0, 40.0]
# fixed non-periodic level index sequence, 12 of each of 4 levels
IDX = [0, 2, 1, 3, 3, 0, 2, 1, 0, 3, 1, 2, 2, 3, 0, 1,
       1, 0, 3, 2, 3, 1, 0, 2, 0, 1, 2, 3, 2, 0, 3, 1,
       1, 3, 2, 0, 3, 2, 1, 0, 0, 2, 3, 1, 1, 2, 0, 3]


def test_transfer_entropy_directional(spark):
    # y_t = x_{t-1}: x drives y with a 1-hour lag. TE(x->y) must be
    # large (x's past pins y's next bin); TE(y->x) small (y's past is
    # x's older past — little extra info about x's next move)
    x = [LEVELS[i] for i in IDX]
    y = [None] + [LEVELS[i] for i in IDX[:-1]]
    df = _mk(spark, {"x": x, "y": y})
    out = {
        (r.metric_x, r.metric_y): r for r in transfer_entropy(df).collect()
    }
    fwd = out[("x", "y")].te_nats
    bwd = out[("y", "x")].te_nats
    assert fwd > bwd + 0.3
    assert fwd > 0.5
    # each level appears 12x -> ntile(4) puts each level in its own
    # bin; 46 aligned triples (hours 2..47)
    assert out[("x", "y")].n_triples == 46


def test_transfer_entropy_self_determined_target_is_zero(spark):
    # y cycles 0,1,2,3 — its own past fully determines its next bin,
    # so x's past can add NOTHING: for every (y,x) cell y' is fixed,
    # hence cxyz = cyz and cyy = cy and every log ratio is exactly 1
    # -> TE(x->y) == 0 exactly (not just small)
    x = [LEVELS[i] for i in IDX]
    y = [LEVELS[t % 4] for t in range(len(IDX))]
    df = _mk(spark, {"x": x, "y": y})
    out = {
        (r.metric_x, r.metric_y): r.te_nats
        for r in transfer_entropy(df).collect()
    }
    assert out[("x", "y")] == 0.0


def test_pacf_matches_hand_durbin_levinson(spark):
    # event-count series with real serial structure but |rho1| < 1:
    # counts cycle 3,1,2 per hour over 36 hours (strict alternation
    # would give rho1 = -1 and a degenerate Durbin-Levinson level 2)
    rows = []
    for i in range(36):
        for j in range((3, 1, 2)[i % 3]):
            rows.append(
                ("c", "m", T0 + dt.timedelta(hours=i), i * 10 + j, 1.0)
            )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    acf = {r.lag_h: r.acf for r in acf_spectrum(df, max_lag=3).collect()}
    r1, r2, r3 = acf[1], acf[2], acf[3]
    p22 = (r2 - r1 * r1) / (1.0 - r1 * r1)
    p21 = r1 - p22 * r1
    p33 = (r3 - (p21 * r2 + p22 * r1)) / (1.0 - (p21 * r1 + p22 * r2))
    out = pacf3(df).collect()
    assert len(out) == 1
    row = out[0]
    assert row.n_hours == 36
    assert row.phi11 == pytest.approx(r1, abs=2e-6)
    assert row.phi22 == pytest.approx(p22, abs=2e-6)
    assert row.phi33 == pytest.approx(p33, abs=2e-6)


def test_pacf_constant_series_null(spark):
    rows = [
        ("c", "m", T0 + dt.timedelta(hours=i), i, 1.0) for i in range(30)
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = pacf3(df).collect()
    assert len(out) == 1
    r = out[0]
    assert r.phi11 is None and r.phi22 is None and r.phi33 is None

"""Stratified IPW readout (operators/abtest.ipw_strata): exact
counts/propensities per stratum, confounding corrected within strata,
positivity violations yield NULL effect."""

from __future__ import annotations

import datetime as dt

from timeseriescorrelation_spark.operators.abtest import ipw_strata

T0 = dt.datetime(2024, 3, 1)

EV_SCHEMA = "user_id long, event_type string, ts timestamp"


def _user(uid, types):
    return [(uid, t, T0 + dt.timedelta(minutes=i))
            for i, t in enumerate(types)]


def test_counts_and_effects(spark):
    rows = []
    # low-activity stratum (1-2 events each; mean pulled up by highs):
    # u1 treated+converted, u2 treated not converted, u3 control
    # converted, u4 control not.
    rows += _user(1, ["click", "purchase"])
    rows += _user(2, ["click"])
    rows += _user(3, ["purchase"])
    rows += _user(4, ["view"])
    # high-activity stratum (12 events each): u5 treated converted,
    # u6 control not converted.
    rows += _user(5, ["click"] * 11 + ["purchase"])
    rows += _user(6, ["view"] * 12)
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {r.stratum: r for r in ipw_strata(df).collect()}
    lo = out["low"]
    assert (lo.n, lo.n_treat, lo.y1, lo.y0) == (4, 2, 1, 1)
    assert abs(lo.p_treat - 0.5) < 1e-9
    assert abs(lo.effect - (1 / 2 - 1 / 2)) < 1e-9
    hi = out["high"]
    assert (hi.n, hi.n_treat, hi.y1, hi.y0) == (2, 1, 1, 0)
    assert abs(hi.effect - 1.0) < 1e-9


def test_positivity_violation_null(spark):
    # every member of the (single) stratum is treated -> NULL effect
    rows = _user(1, ["click"]) + _user(2, ["click", "purchase"])
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = ipw_strata(df).collect()
    assert all(r.effect is None for r in out)
    assert all(r.mean_y1 is None and r.mean_y0 is None for r in out)

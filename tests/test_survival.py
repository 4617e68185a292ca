"""Kaplan-Meier: hand-computed curve with a censored conversation."""

from __future__ import annotations

import datetime as dt

T0 = dt.datetime(2024, 5, 1)


def _ev(conv, minutes, idx):
    return (conv, "m", T0 + dt.timedelta(minutes=minutes), idx, 1.0)


def test_km_hand_computed_with_censoring(spark):
    from timeseriescorrelation_spark.operators.survival import km_survival

    rows = [
        _ev("A", 0, 0), _ev("A", 10, 1),     # dur 10m, dies
        _ev("B", 5, 2), _ev("B", 15, 3),     # dur 10m, dies
        _ev("C", 0, 4), _ev("C", 20, 5),     # dur 20m, dies
        _ev("D", 0, 6), _ev("D", 180, 7),    # at frontier -> censored
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = sorted(
        km_survival(df, censor_horizon_s=3600).collect(),
        key=lambda r: r.t_us,
    )
    # events at 10m (d=2, n=4 -> S=1/2) and 20m (d=1, n=2 -> S=1/4);
    # D stays in both risk sets but never appears as an event row
    assert [(r.t_us, r.n_risk, r.d_events, r.surv) for r in out] == [
        (600_000_000, 4, 2, 0.5),
        (1_200_000_000, 2, 1, 0.25),
    ]
    assert out[0].logsurv_u == round(-0.6931471805599453 * 1e6)
    assert out[1].logsurv_u == 2 * round(-0.6931471805599453 * 1e6)


def test_km_all_die_reaches_zero(spark):
    from timeseriescorrelation_spark.operators.survival import km_survival

    # Z ends at the frontier (always censored) but with a SHORT
    # duration, so B's death at 200m exhausts the risk set
    rows = [
        _ev("A", 0, 0), _ev("A", 10, 1),        # dies at 10m
        _ev("B", 0, 2), _ev("B", 200, 3),       # dies at 200m, n==d
        _ev("Z", 480, 4), _ev("Z", 500, 5),     # dur 20m, censored
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double",
    )
    out = sorted(
        km_survival(df, censor_horizon_s=60).collect(),
        key=lambda r: r.t_us,
    )
    last = out[-1]
    # the final event exhausts the risk set: surv exactly 0, log -inf
    assert last.n_risk == last.d_events
    assert last.surv == 0.0 and last.logsurv_u is None


def test_na_hazard_hand_computed(spark):
    from timeseriescorrelation_spark.operators.survival import na_hazard

    rows = [
        _ev("A", 0, 0), _ev("A", 10, 1),     # dur 10m, dies
        _ev("B", 5, 2), _ev("B", 15, 3),     # dur 10m, dies
        _ev("C", 0, 4), _ev("C", 20, 5),     # dur 20m, dies
        _ev("D", 0, 6), _ev("D", 180, 7),    # at frontier -> censored
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = sorted(
        na_hazard(df, censor_horizon_s=3600).collect(),
        key=lambda r: r.t_us,
    )
    # H(10m) = 2/4 = 0.5; H(20m) = 0.5 + 1/2 = 1.0 -- and NA stays
    # finite at the n = d last event where KM's log would hit zero
    assert [(r.t_us, r.n_risk, r.d_events, r.cumhaz_u) for r in out] == [
        (600_000_000, 4, 2, 500_000),
        (1_200_000_000, 2, 1, 1_000_000),
    ]
    assert out[1].cumhaz == 1.0

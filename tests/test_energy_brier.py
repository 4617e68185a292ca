"""Energy distance + Brier decomposition."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.analytics import (
    brier_decomposition,
)
from timeseriescorrelation_spark.operators.crossmetric import (
    energy_distance_weekend,
)

MON = dt.datetime(2026, 1, 5)   # Monday


def _series(spark, day_vals, metric="m"):
    # day_vals: {day_offset: value}
    return spark.createDataFrame(
        [(metric, MON + dt.timedelta(days=d), float(v))
         for d, v in day_vals.items()],
        ["metric", "ts", "value"],
    )


def test_energy_same_law_is_zero(spark):
    # identical constant on weekdays and weekends -> E = 0
    vals = {d: 10.0 for d in range(28)}
    out = energy_distance_weekend(_series(spark, vals)).collect()[0]
    assert out["energy_dist"] == 0.0
    # 2E|X-Y| = 0 too -> coefficient undefined
    assert out["e_coef"] is None


def test_energy_shifted_weekend_positive(spark):
    vals = {}
    for d in range(28):
        dow = (d + 0) % 7   # day 5,6 of each week = Sat/Sun
        vals[d] = 100.0 if dow in (5, 6) else 10.0
    out = energy_distance_weekend(_series(spark, vals)).collect()[0]
    assert out["n_weekend"] == 8 and out["n_weekday"] == 20
    # pure location shift: E = 2*90 - 0 - 0 = 180 value units
    assert out["energy_dist"] == pytest.approx(180.0, abs=1e-6)
    assert out["e_coef"] == 1.0


def _events(spark, n_days=30):
    # deterministic transitions so the calibration table is non-trivial
    rows = []
    seq = ["a", "b", "a", "c", "a", "b"]
    for d in range(n_days):
        for i, et in enumerate(seq):
            rows.append(
                ("1", et, MON + dt.timedelta(days=d, minutes=i), i, 1.0)
            )
    return spark.createDataFrame(
        rows, ["conv_id", "metric", "ts", "turn_idx", "value"]
    )


def test_brier_decomposition_identity_and_bounds(spark):
    out = brier_decomposition(_events(spark)).collect()[0]
    assert out["n_pairs"] > 0
    assert out["brier_rel"] >= 0.0 and out["brier_res"] >= 0.0
    assert 0.0 <= out["brier_unc"] <= 0.25
    assert out["brier"] == pytest.approx(
        out["brier_rel"] - out["brier_res"] + out["brier_unc"], abs=2e-6
    )


def test_brier_perfectly_calibrated_model_low_rel(spark):
    # stationary sequence: train and eval share transition law ->
    # reliability (miscalibration) term is small
    out = brier_decomposition(_events(spark, n_days=40)).collect()[0]
    assert out["brier_rel"] < 0.02

"""Cox PH (weekend covariate) + Gumbel block-maxima fit."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.survival import (
    cox_weekend,
    gumbel_maxima,
)

SAT = dt.datetime(2026, 1, 3)
MON = dt.datetime(2026, 1, 5)


def _series(spark, convs):
    rows = []
    for cid, start, dur in convs:
        rows.append((str(cid), "m", start, 0, 1.0))
        rows.append((str(cid), "m", start + dt.timedelta(minutes=dur),
                     1, 1.0))
    rows.append(("zz", "m", MON + dt.timedelta(days=30), 0, 1.0))
    return spark.createDataFrame(
        rows, ["conv_id", "metric", "ts", "turn_idx", "value"]
    )


def test_cox_identical_arms_beta_near_zero(spark):
    durs = [10, 20, 30, 40, 50]
    convs = [(f"we{i}", SAT, d) for i, d in enumerate(durs)]
    convs += [(f"wd{i}", MON, d) for i, d in enumerate(durs)]
    out = cox_weekend(_series(spark, convs)).collect()[0]
    assert out["beta"] == pytest.approx(0.0, abs=0.05)
    assert out["hazard_ratio"] == pytest.approx(1.0, abs=0.05)


def test_cox_weekend_dies_faster_positive_beta(spark):
    convs = [(f"we{i}", SAT, 1 + i) for i in range(10)]
    convs += [(f"wd{i}", MON, 200 + i) for i in range(10)]
    out = cox_weekend(_series(spark, convs)).collect()[0]
    # weekend arm dies first at every pooled time -> hazard ratio > 1
    assert out["beta"] > 0.5
    assert out["hazard_ratio"] > 1.5
    assert out["se"] is not None and out["z"] > 0


def test_cox_z_consistency(spark):
    convs = [(f"we{i}", SAT, 5 * (i + 1)) for i in range(8)]
    convs += [(f"wd{i}", MON, 7 * (i + 1)) for i in range(8)]
    out = cox_weekend(_series(spark, convs)).collect()[0]
    assert out["z"] == pytest.approx(out["beta"] / out["se"], abs=1e-4)


def _daily(spark, maxima, metric="a"):
    base = dt.datetime(2026, 1, 1)
    rows = []
    for d, mx in enumerate(maxima):
        rows.append((metric, base + dt.timedelta(days=d, hours=1), 0,
                     float(mx)))
        rows.append((metric, base + dt.timedelta(days=d, hours=2), 1,
                     float(mx) / 2))
    return spark.createDataFrame(
        rows, ["metric", "ts", "turn_idx", "value"]
    )


def test_gumbel_hand_moments(spark):
    import statistics

    maxima = [10.0, 12.0, 15.0, 11.0, 13.0, 20.0]
    out = gumbel_maxima(_daily(spark, maxima)).collect()[0]
    cents = [m * 100 for m in maxima]
    mean, sd = statistics.mean(cents), statistics.stdev(cents)
    beta = sd * math.sqrt(6) / math.pi
    loc = mean - 0.5772156649015329 * beta
    rl = loc - beta * math.log(-math.log(1 - 1 / 100))
    assert out["n_days"] == 6
    assert out["mean_max"] == pytest.approx(mean / 100, abs=2e-6)
    assert out["gumbel_scale"] == pytest.approx(beta / 100, abs=2e-6)
    assert out["gumbel_loc"] == pytest.approx(loc / 100, abs=2e-6)
    assert out["rl_100"] == pytest.approx(rl / 100, abs=2e-5)
    # the 100-day return level sits above every observed maximum
    assert out["rl_100"] > max(maxima)


def test_gumbel_constant_maxima(spark):
    out = gumbel_maxima(_daily(spark, [10.0] * 6)).collect()[0]
    assert out["sd_max"] == 0.0
    assert out["gumbel_scale"] == 0.0
    assert out["rl_100"] == out["gumbel_loc"] == out["mean_max"]

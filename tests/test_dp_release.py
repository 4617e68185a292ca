"""DP-shaped Laplace release (operators/privacy.dp_release): noise is
deterministic per group key, distributed ~Laplace(1/ε) (median ≈ 0,
mean |noise| ≈ 1/ε), scales as 1/ε, and never depends on the count."""

from __future__ import annotations

import datetime as dt

import numpy as np

from timeseriescorrelation_spark.operators.privacy import dp_release

EV_SCHEMA = "event_type string, ts timestamp, user_id long"
T0 = dt.datetime(2024, 3, 1)


def _mk(spark, n_groups=200, per=3):
    rows = []
    for g in range(n_groups):
        for i in range(per):
            rows.append((f"t{g}", T0, i))
    return spark.createDataFrame(rows, EV_SCHEMA)


def test_deterministic_and_additive(spark):
    df = _mk(spark, n_groups=10)
    a = {r.event_type: r for r in dp_release(df).collect()}
    b = {r.event_type: r for r in dp_release(df).collect()}
    for k in a:
        assert a[k].noise == b[k].noise  # seeded, not random
        assert abs(a[k].noisy_n - (a[k].n + a[k].noise)) < 1e-6
        assert a[k].n == 3


def test_laplace_shape(spark):
    df = _mk(spark, n_groups=400)
    noises = np.array(
        [r.noise for r in dp_release(df, epsilon=1.0).collect()]
    )
    assert len(noises) == 400
    # Laplace(b=1): median 0, E|x| = 1, P(|x|>3) = e^-3 ≈ 5%
    assert abs(np.median(noises)) < 0.2
    assert abs(np.abs(noises).mean() - 1.0) < 0.25
    assert (np.abs(noises) > 3).mean() < 0.12


def test_epsilon_scales_noise(spark):
    df = _mk(spark, n_groups=50)
    n1 = {r.event_type: r.noise
          for r in dp_release(df, epsilon=1.0).collect()}
    n4 = {r.event_type: r.noise
          for r in dp_release(df, epsilon=4.0).collect()}
    for k in n1:
        assert abs(n4[k] - n1[k] / 4.0) < 1e-6  # 6-dp round residue

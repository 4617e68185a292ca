"""Diagonal Mahalanobis (operators/similarity.embedding_mahalanobis):
matches the brute-force numpy value on snapped inputs, a planted
far-out vector flags as outlier, zero-variance dims drop from d_eff."""

from __future__ import annotations

import numpy as np

from timeseriescorrelation_spark.operators.similarity import (
    embedding_mahalanobis,
)

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _rows(mat, label, id0):
    return [(id0 + i, [float(v) for v in row], label)
            for i, row in enumerate(mat)]


def test_matches_numpy(spark):
    rng = np.random.default_rng(13)
    a = rng.normal(0.0, 0.2, (20, 8)).astype(np.float32)
    df = spark.createDataFrame(_rows(a, 0, 0), EMB_SCHEMA)
    out = {r.vec_id: r for r in embedding_mahalanobis(df).collect()}
    x = np.round(a.astype(np.float64) * 1e6)  # µ-snap
    mu = x.mean(axis=0)
    var = x.var(axis=0)  # population
    for i in range(20):
        want = (((x[i] - mu) ** 2) / var).sum()
        got = out[i].md2
        assert abs(got - want) < 1e-3, (i, got, want)
        assert out[i].d_eff == 8


def test_planted_outlier_flags(spark):
    rng = np.random.default_rng(17)
    a = rng.normal(0.0, 0.1, (40, 64)).astype(np.float32)
    a[7] += 1.5  # far outside every dim's spread
    df = spark.createDataFrame(_rows(a, 0, 0), EMB_SCHEMA)
    out = {r.vec_id: r for r in embedding_mahalanobis(df).collect()}
    assert out[7].is_outlier
    assert out[7].md2 == max(r.md2 for r in out.values())
    assert sum(1 for r in out.values() if r.is_outlier) <= 3


def test_zero_variance_dim_drops(spark):
    rows = [
        (0, [1.0, 0.5], 0),
        (1, [1.0, 0.7], 0),
        (2, [1.0, 0.9], 0),
    ]
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = embedding_mahalanobis(df).collect()
    assert all(r.d_eff == 1 for r in out)  # dim 1 is constant

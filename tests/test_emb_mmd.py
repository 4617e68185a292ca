"""Polynomial-kernel MMD² (operators/similarity.embedding_mmd): the
moment-matrix form equals the brute-force biased V-statistic with
k(x,y) = (xᵀy)²; identical sources give MMD² ≈ 0; output covers every
label pair exactly once."""

from __future__ import annotations

import numpy as np

from timeseriescorrelation_spark.operators.similarity import embedding_mmd

EMB_SCHEMA = "vec_id long, embedding array<float>, label int"


def _rows(mat, label, id0):
    return [
        (id0 + i, [float(v) for v in row], label)
        for i, row in enumerate(mat)
    ]


def _mmd2_brute(a, b):
    """Biased V-statistic MMD² with k(x,y)=(x·y)², after the same
    µ-unit snap the operator applies."""
    a = np.round(a * 1e6) / 1e6
    b = np.round(b * 1e6) / 1e6
    kaa = (a @ a.T) ** 2
    kbb = (b @ b.T) ** 2
    kab = (a @ b.T) ** 2
    return kaa.mean() + kbb.mean() - 2 * kab.mean()


def test_matches_bruteforce_kernel(spark):
    rng = np.random.default_rng(7)
    a = rng.normal(0.0, 0.2, (12, 6)).astype(np.float32)
    b = rng.normal(0.1, 0.3, (15, 6)).astype(np.float32)
    df = spark.createDataFrame(_rows(a, 0, 0) + _rows(b, 1, 100),
                               EMB_SCHEMA)
    out = embedding_mmd(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.label_a, r.label_b, r.n_a, r.n_b) == (0, 1, 12, 15)
    want = _mmd2_brute(a.astype(np.float64), b.astype(np.float64))
    assert abs(r.mmd2 - want) < 1e-5


def test_identical_sources_zero(spark):
    rng = np.random.default_rng(11)
    a = rng.normal(0.0, 0.2, (10, 5)).astype(np.float32)
    df = spark.createDataFrame(_rows(a, 0, 0) + _rows(a, 1, 50),
                               EMB_SCHEMA)
    r = embedding_mmd(df).collect()[0]
    assert r.mmd2 == 0.0


def test_all_pairs_once(spark):
    rng = np.random.default_rng(3)
    rows = []
    for lbl in range(4):
        rows += _rows(rng.normal(0, 0.2, (5, 4)).astype(np.float32),
                      lbl, 100 * lbl)
    df = spark.createDataFrame(rows, EMB_SCHEMA)
    out = embedding_mmd(df).collect()
    pairs = {(r.label_a, r.label_b) for r in out}
    assert pairs == {(i, j) for i in range(4) for j in range(4) if i < j}
    assert all(r.mmd2 >= 0 for r in out)

"""Simplified silhouette + DAU/MAU stickiness."""

from __future__ import annotations

import datetime as dt

import pytest

from timeseriescorrelation_spark.operators.retention import stickiness_daily
from timeseriescorrelation_spark.operators.similarity import (
    silhouette_clusters,
)

BASE = dt.datetime(2026, 1, 1)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        ["vec_id", "embedding"],
    )


def test_silhouette_separated_clusters_near_one(spark):
    # two tight, orthogonal bundles; k=2 with vec_id%2 seeding splits
    # them immediately (even ids = x-ish, odd ids = y-ish)
    vecs = []
    for i in range(8):
        if i % 2 == 0:
            vecs.append([1.0, 0.01 * i, 0.0])
        else:
            vecs.append([0.01 * i, 1.0, 0.0])
    out = silhouette_clusters(_emb(spark, vecs), k=2, n_iter=2).collect()
    assert len(out) == 2
    assert all(r["mean_silhouette"] > 0.8 for r in out)
    assert sum(r["n"] for r in out) == 8


def test_silhouette_identical_vectors_zero(spark):
    # all vectors IDENTICAL: every distance is 0, the max(a,b)=0
    # guard fires and silhouette is exactly 0 (not NaN/NULL)
    vecs = [[1.0, 2.0, 3.0]] * 6
    out = silhouette_clusters(_emb(spark, vecs), k=2, n_iter=1).collect()
    assert all(r["mean_silhouette"] == 0.0 for r in out)
    assert sum(r["n"] for r in out) == 6


def _events(spark, rows):
    # rows: (user, day)
    return spark.createDataFrame(
        [(int(u), BASE + dt.timedelta(days=d)) for u, d in rows],
        ["user_id", "ts"],
    )


def test_stickiness_daily_user_is_one(spark):
    df = _events(spark, [(1, d) for d in range(5)])
    rows = stickiness_daily(df).collect()
    assert all(r["stickiness"] == 1.0 for r in rows)
    assert all(r["dau"] == 1 and r["mau"] == 1 for r in rows)


def test_stickiness_hand_case(spark):
    # u1 active days 0 and 2; u2 active day 0 only
    df = _events(spark, [(1, 0), (2, 0), (1, 2)])
    out = {r["day_ts"].day: r for r in stickiness_daily(df).collect()}
    # day grid: 0..2 (clipped at last active day)
    assert out[1]["dau"] == 2 and out[1]["mau"] == 2
    assert out[2]["dau"] == 0 and out[2]["mau"] == 2
    assert out[3]["dau"] == 1 and out[3]["mau"] == 2
    assert out[3]["stickiness"] == 0.5


def test_stickiness_window_expiry(spark):
    # u2 seen on day 0 only; by day 30 it is outside the 30d window
    df = _events(spark, [(1, d) for d in range(31)] + [(2, 0)])
    out = {
        (r["day_ts"] - BASE).days: r
        for r in stickiness_daily(df).collect()
    }
    assert out[29]["mau"] == 2           # day 29 still covers day 0
    assert out[30]["mau"] == 1           # day 0 aged out
    assert out[30]["stickiness"] == 1.0

"""Complexity features (operators/tsfeatures): permutation entropy,
sample entropy, Hjorth parameters, CID/c3/trev — hand-built fixtures
with closed-form answers (monotone ⇒ zero entropy, alternating ⇒ one
pattern pair, linear trend ⇒ zero second difference)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from timeseriescorrelation_spark.operators.tsfeatures import (
    complexity_stats,
    hjorth_params,
    permutation_entropy,
    sample_entropy,
)

T0 = dt.datetime(2024, 3, 1, 0, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _mk(spark, values, metric="m"):
    rows = []
    for i, v in enumerate(values):
        ts = T0 + dt.timedelta(hours=i)
        rows.append(("c", metric, ts, i, float(v)))
    return spark.createDataFrame(rows, SERIES_SCHEMA)


def test_permutation_entropy_monotone_is_zero(spark):
    """A strictly increasing day has a single ordinal pattern, so
    pe = 0 and pe_norm = 0."""
    out = permutation_entropy(
        _mk(spark, [float(i + 1) for i in range(24)])
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_pat == 22 and r.n_distinct == 1
    assert r.pe == 0.0 and r.pe_norm == 0.0


def test_permutation_entropy_alternating_two_patterns(spark):
    """1,2,1,2,… yields exactly the two zig-zag patterns in
    near-equal counts: pe = ln2 (11/11 split over 22 triples)."""
    out = permutation_entropy(
        _mk(spark, [1.0 if i % 2 == 0 else 2.0 for i in range(24)])
    ).collect()
    r = out[0]
    assert r.n_distinct == 2
    assert r.pe == round(math.log(2.0), 6)


def test_sample_entropy_constant_is_fully_regular(spark):
    """A constant day: every template matches, A == B, sampen = 0."""
    out = sample_entropy(_mk(spark, [5.0] * 24)).collect()
    r = out[0]
    assert r.b_m > 0 and r.a_m1 == r.b_m
    assert r.sampen == 0.0


def test_sample_entropy_counts_match_python(spark):
    """Exact B/A counts vs a direct O(n²) Python loop with the same
    integer tolerance (r = 500 cents)."""
    vals = [3.0, 8.0, 3.5, 9.0, 2.0, 7.5, 3.2, 8.8, 2.9, 8.1,
            3.6, 7.9]
    y = [round(v * 100) for v in vals]
    n = len(y)
    b = a = 0
    for i in range(n):
        for j in range(i + 1, n):
            if j + 2 >= n:
                continue
            if (abs(y[i] - y[j]) <= 500
                    and abs(y[i + 1] - y[j + 1]) <= 500):
                b += 1
                if abs(y[i + 2] - y[j + 2]) <= 500:
                    a += 1
    r = sample_entropy(_mk(spark, vals)).collect()[0]
    assert (r.b_m, r.a_m1) == (b, a)
    assert r.sampen == round(-math.log(a / b), 6)


def test_hjorth_linear_trend_zero_complexity_num(spark):
    """y = 7t: first differences constant (Var(Δy)=0 ⇒ mobility 0),
    second differences zero."""
    out = hjorth_params(
        _mk(spark, [7.0 * i for i in range(24)])
    ).collect()
    r = out[0]
    # activity of 0,700,…,16100 cents in units²: var(7t, t<24)/1
    ys = [7.0 * i for i in range(24)]
    mean = sum(ys) / 24
    var_units = sum((v - mean) ** 2 for v in ys) / 24
    assert r.activity == pytest.approx(var_units, abs=1e-6)
    assert r.mobility == 0.0


def test_complexity_stats_constant_degenerate(spark):
    """Constant series: cid_ce = 0, c3 = v³, trev = 0."""
    out = complexity_stats(_mk(spark, [4.0] * 24)).collect()
    r = out[0]
    assert r.cid_ce == 0.0
    assert r.c3 == pytest.approx(64.0, abs=1e-6)
    assert r.trev == 0.0


def test_complexity_stats_cid_matches_python(spark):
    vals = [3.21, 1.05, 4.10, 1.50, 5.92, 2.60, 6.53, 3.50, 5.89,
            7.93, 2.38, 4.62]
    y = [round(v * 100) for v in vals]
    cid_cents = math.sqrt(
        sum((y[i + 1] - y[i]) ** 2 for i in range(len(y) - 1))
    )
    r = complexity_stats(_mk(spark, vals)).collect()[0]
    assert r.cid_ce == pytest.approx(cid_cents / 100.0, abs=1e-6)


def test_min_hours_gate(spark):
    """Days with fewer than min_hours observations emit no row."""
    short = _mk(spark, [1.0, 2.0, 3.0, 4.0, 5.0])
    assert permutation_entropy(short).count() == 0
    assert sample_entropy(short).count() == 0
    assert hjorth_params(short).count() == 0
    assert complexity_stats(short).count() == 0

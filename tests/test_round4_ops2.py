"""Round-4 batch 2 unit tests: ohlc_daily, bland_altman, ess_hourly,
burrows_delta, retention_decay_fit, minhash_error_audit,
embedding_anisotropy — invariants and hand replicas next to their
SQL-oracle gates."""

from __future__ import annotations

import datetime as dt

import numpy as np

T0 = dt.datetime(2026, 5, 4)  # a Monday

SERIES = ("conv_id string, metric string, ts timestamp, turn_idx int,"
          " value double")


def _hourly(spark, vals, metric="m"):
    rows = [("c", metric, T0 + dt.timedelta(hours=i), i, float(v))
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, SERIES)


def test_ohlc_daily_planted_candle(spark):
    from timeseriescorrelation_spark.operators.indicators import (
        ohlc_daily,
    )

    # day 1: 10, 30, 5, 20  (o=10 h=30 l=5 c=20); day 2 opens at 50
    vals = [10, 30, 5, 20] + [0] * 20 + [50, 60]
    got = {r.day_ts: r for r in ohlc_daily(_hourly(spark, vals)).collect()}
    d1 = got[T0]
    assert (d1.open, d1.high, d1.low, d1.close) == (10.0, 30.0, 0.0, 0.0)
    assert d1.gap is None and d1.n_hours == 24
    d2 = got[T0 + dt.timedelta(days=1)]
    assert d2.open == 50.0 and d2.close == 60.0
    assert d2.gap == 50.0  # 50 - prior close 0
    assert d2.body == 10.0 and d2.day_range == 10.0


def test_bland_altman_constant_offset(spark):
    from timeseriescorrelation_spark.operators.agreement import (
        bland_altman,
    )

    # b = a - 3 exactly: bias 3, zero SD -> degenerate limits = bias
    rows = []
    for i in range(48):
        rows.append(("c", "a", T0 + dt.timedelta(hours=i), i,
                     10.0 + (i % 5)))
        rows.append(("c", "b", T0 + dt.timedelta(hours=i), i,
                     7.0 + (i % 5)))
    df = spark.createDataFrame(rows, SERIES)
    r = bland_altman(df, "a", "b").collect()[0]
    assert r.n_hours == 48
    assert r.mean_diff == 3.0
    assert r.loa_low == 3.0 == r.loa_high
    assert r.n_outside == 0


def test_ess_white_noise_near_n(spark):
    from timeseriescorrelation_spark.operators.acf import ess_hourly

    rng = np.random.RandomState(3)
    # conv_id/turn_idx don't matter: ess uses event counts per hour;
    # build one event per hour plus noise-many extra events
    rows = []
    i = 0
    for h in range(200):
        for _ in range(1 + int(rng.poisson(5))):
            rows.append(("c", "m", T0 + dt.timedelta(hours=h), i, 1.0))
            i += 1
    df = spark.createDataFrame(rows, SERIES)
    r = ess_hourly(df).collect()[0]
    assert r.n_hours == 200
    # iid counts: tau near 1, ESS within a factor ~2 of n
    assert 0.5 < r.tau < 2.0
    assert r.ess > 100


def test_burrows_delta_outlier_source(spark):
    from timeseriescorrelation_spark.operators.textstats import (
        burrows_delta,
    )

    rows = []
    did = 0
    # 4 sources share a style; source "odd" uses different function
    # words entirely
    for s in ("s1", "s2", "s3", "s4"):
        for _ in range(10):
            rows.append((did, "the cat and the dog and the bird", "en", s, 10))
            did += 1
    for _ in range(10):
        rows.append((did, "zip zap zup zip zap zup zip zap", "en", "odd", 10))
        did += 1
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long"
    )
    res = burrows_delta(docs, top_k=8).collect()
    d = {}
    for r in res:
        d[(r.source_a, r.source_b)] = r.delta
    same = [v for (a, b), v in d.items() if "odd" not in (a, b)]
    cross = [v for (a, b), v in d.items() if "odd" in (a, b)]
    assert max(same) < min(cross)


def test_retention_decay_planted_power_law(spark):
    from timeseriescorrelation_spark.operators.retention import (
        retention_decay_fit,
    )

    # plant r(d) = 0.5 * d^-0.5 over a single cohort of 1000 users,
    # 25 ages, all cohorts start day 0 so the denominator is constant
    rng = np.random.RandomState(1)
    rows = []
    eid = 0
    n_users = 1000
    for u in range(n_users):
        rows.append((eid, T0, u, "click", 1.0, None)); eid += 1
    for dday in range(1, 26):
        keep = int(round(n_users * 0.5 * dday ** -0.5))
        for u in range(keep):
            rows.append((eid, T0 + dt.timedelta(days=dday), u,
                         "click", 1.0, None)); eid += 1
    # frontier pusher (its own cohort; joins the denominator)
    rows.append((eid, T0 + dt.timedelta(days=40), 10**6, "click", 1.0,
                 None))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string"
    )
    r = retention_decay_fit(ev).collect()[0]
    assert abs(r.exponent - (-0.5)) < 0.05
    assert r.r2 > 0.98
    assert abs(r.r_day1 - 0.5) < 0.01


def test_minhash_error_zero_for_identical_docs(spark):
    from timeseriescorrelation_spark.operators.dedup import (
        minhash_error_audit,
    )

    # identical docs: exact jaccard 1 and signature agreement 1 ->
    # zero error on those pairs
    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta", "en",
             "s", 8) for i in range(6)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long"
    )
    r = minhash_error_audit(docs).collect()[0]
    assert r.n_pairs == 15
    assert r.mae == 0.0 and r.bias == 0.0 and r.max_abs_err == 0.0


def test_anisotropy_identical_and_orthogonal(spark):
    from timeseriescorrelation_spark.operators.similarity import (
        embedding_anisotropy,
    )

    # identical vectors: avg pairwise cos = 1
    same = spark.createDataFrame(
        [(i, [3.0, 4.0]) for i in range(5)],
        "vec_id long, embedding array<double>",
    )
    r = embedding_anisotropy(same).collect()[0]
    assert abs(r.avg_cos - 1.0) < 1e-5
    assert abs(r.mean_norm2 - 1.0) < 1e-5
    # balanced orthogonal pairs: avg cos = -1/(n-1) (sum vector = 0)
    orth = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0]),
         (2, [0.0, 1.0]), (3, [0.0, -1.0])],
        "vec_id long, embedding array<double>",
    )
    r2 = embedding_anisotropy(orth).collect()[0]
    assert abs(r2.avg_cos - (-1.0 / 3.0)) < 1e-5
    assert abs(r2.mean_norm2) < 1e-9


def test_xmr_chart_flags_planted_shift(spark):
    from timeseriescorrelation_spark.operators.spc import xmr_chart

    rng = np.random.RandomState(7)
    vals = list(rng.normal(100, 1, 25)) + [200.0]  # day 26 jumps
    rows = [("c", "m", T0 + dt.timedelta(days=i), i, float(v))
            for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, SERIES)
    got = sorted(xmr_chart(df).collect(), key=lambda r: r.day_ts)
    assert got[0].mr is None and got[0].ooc_mr is None
    assert got[-1].ooc_x == 1 and got[-1].ooc_mr == 1
    assert all(r.ooc_x == 0 for r in got[:-1])


def test_process_capability_capable_vs_not(spark):
    from timeseriescorrelation_spark.operators.spc import (
        process_capability,
    )

    rng = np.random.RandomState(11)
    rows = []
    for i in range(30):
        # tight: mean 100 sd~1 inside [50, 150] -> high cpk
        rows.append(("c", "tight", T0 + dt.timedelta(days=i), i,
                     float(rng.normal(100, 1))))
        # wide: sd ~40 -> low cpk, some days out of spec
        rows.append(("c", "wide", T0 + dt.timedelta(days=i), i,
                     float(rng.normal(100, 40))))
    df = spark.createDataFrame(rows, SERIES)
    got = {r.metric: r for r in
           process_capability(df, lsl=50.0, usl=150.0).collect()}
    assert got["tight"].cpk > 1.33 > got["wide"].cpk
    assert got["tight"].pct_out == 0.0
    assert got["wide"].pct_out > 0.1


def test_markov_absorption_deterministic_chain(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        markov_absorption,
    )

    # a -> b -> purchase deterministic; c -> c loop (never absorbs)
    rows = []
    eid = 0
    for u in range(10):
        for j, t in enumerate(("a", "b", "purchase")):
            rows.append((eid, T0 + dt.timedelta(minutes=j), u, t, 1.0,
                         None)); eid += 1
    for u in range(100, 110):
        for j in range(4):
            rows.append((eid, T0 + dt.timedelta(minutes=j), u, "c",
                         1.0, None)); eid += 1
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
              " event_type string, value double, props string"
    )
    got = {r.state: r for r in
           markov_absorption(ev, target="purchase", k_steps=8)
           .collect()}
    assert got["purchase"].p_absorb == 1.0
    assert got["b"].p_absorb == 1.0
    assert got["a"].p_absorb == 1.0
    assert got["c"].p_absorb == 0.0

"""Round-4 operator unit tests: ewma_chart, its_readout,
lang_temperature_weights, personalized PageRank, weibull_fit —
independent replicas / invariants next to their SQL-oracle gates."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest

T0 = dt.datetime(2026, 4, 1)

SERIES = ("conv_id string, metric string, ts timestamp, turn_idx int,"
          " value double")


def _hourly_series(spark, name_to_vals):
    rows = []
    for name, vals in name_to_vals.items():
        for i, v in enumerate(vals):
            rows.append(("c", name, T0 + dt.timedelta(hours=i), i,
                         float(v)))
    return spark.createDataFrame(rows, SERIES)


def test_ewma_chart_matches_truncated_kernel_replica(spark):
    from timeseriescorrelation_spark.operators.spc import ewma_chart

    rng = np.random.RandomState(2)
    vals = list(rng.normal(50, 5, 80))
    vals[60:] = [v + 12 for v in vals[60:]]  # persistent shift
    got = {r.hour_ts: r for r in ewma_chart(
        _hourly_series(spark, {"m": vals})
    ).collect()}
    # replica over cents
    y = [round(v * 100) for v in vals]
    K = 24
    w = [1 * 3 ** j * 4 ** (K - 1 - j) for j in range(K)]
    W = sum(w)
    varfac = sum(x * x for x in w) / (W * W)
    mu = sum(y) / len(y)
    var = (len(y) * sum(v * v for v in y) - sum(y) ** 2) / len(y) ** 2
    sig = math.sqrt(var)
    flagged = 0
    for t in range(K - 1, len(y)):
        z = sum(w[j] * y[t - j] for j in range(K)) / W
        ts = T0 + dt.timedelta(hours=t)
        r = got[ts]
        assert abs(r.z - round(z / 100.0, 6)) < 1e-9
        ucl = mu + 3.0 * sig * math.sqrt(varfac)
        assert abs(r.ucl - round(ucl / 100.0, 6)) < 1e-6
        if r.ooc == 1:
            flagged += 1
    assert len(got) == len(y) - (K - 1)
    # the +12 shift must trip the chart
    assert flagged >= 5
    assert all(got[T0 + dt.timedelta(hours=t)].ooc == 0
               for t in range(K - 1, 55))


def test_its_readout_recovers_planted_segments(spark):
    from timeseriescorrelation_spark.operators.causality import (
        its_readout,
    )

    # 61 days: pre slope 2/day around level 100; at the midpoint the
    # level jumps +50 and the slope becomes 5/day — noise-free, so the
    # fit must recover the plant almost exactly
    rows = []
    for i in range(61):
        u = i - 30
        y = 100.0 + 2.0 * u + (50.0 + 3.0 * u if u >= 0 else 0.0)
        rows.append(("c", "m", T0 + dt.timedelta(days=i), i, y))
    df = spark.createDataFrame(rows, SERIES)
    r = its_readout(df, min_days=10).collect()[0]
    assert r.n_days == 61
    assert abs(r.slope_pre - 2.0) < 1e-4
    assert abs(r.level_change - 50.0) < 1e-3
    assert abs(r.slope_change - 3.0) < 1e-4
    assert r.r2 > 0.999


def test_lang_temperature_boosts_tail(spark):
    from timeseriescorrelation_spark.operators.lm import (
        lang_temperature_weights,
    )

    rows = [(i, "t", "en") for i in range(900)]
    rows += [(1000 + i, "t", "sw") for i in range(100)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string"
    )
    got = {r.lang: r for r in
           lang_temperature_weights(docs, alpha=0.3).collect()}
    assert got["en"].n_docs == 900 and got["sw"].n_docs == 100
    # alpha sampling: probabilities proportional to p^0.3
    q_en, q_sw = 0.9 ** 0.3, 0.1 ** 0.3
    exp_sw = q_sw / (q_en + q_sw)
    assert abs(got["sw"].p_samp - exp_sw) < 1e-4
    assert got["sw"].boost > 1.0 > got["en"].boost
    assert abs(got["en"].p_samp + got["sw"].p_samp - 1.0) < 2e-6


def test_personalized_pagerank_concentrates_on_seed(spark):
    from pyspark.sql import functions as F

    from timeseriescorrelation_spark.operators.graphrank import (
        pagerank_conserving,
    )

    # star graph: hub 1 connected to 2..6, plus a distant chain 7-8
    edges = []
    for v in range(2, 7):
        edges += [(1, v, 1), (v, 1, 1)]
    edges += [(7, 8, 1), (8, 7, 1)]
    e = spark.createDataFrame(edges, "src long, dst long, w long")
    seeds = spark.createDataFrame([(1,)], "node long")
    pr = {r.node: r.pr_u for r in
          pagerank_conserving(e, n_iter=3, teleport=seeds).collect()}
    # mass conservation: total = 1e6 * |V| exactly
    assert sum(pr.values()) == 1_000_000 * 8
    # seed dominates; the disconnected chain drains toward the seed at
    # 0.85^k per round (its 15% undamped share goes to the pool, which
    # pays only the seed) and the two chain nodes stay symmetric
    assert pr[1] == max(pr.values())
    assert pr[7] == pr[8] < 1_000_000
    # classic (uniform teleport) run unchanged by the new parameter:
    pr_u = {r.node: r.pr_u for r in
            pagerank_conserving(e, n_iter=3).collect()}
    assert sum(pr_u.values()) == 1_000_000 * 8
    assert pr_u[1] > pr_u[7]  # hub still matters, but less extreme
    assert pr[1] > pr_u[1]


def test_weibull_fit_recovers_planted_shape(spark):
    from timeseriescorrelation_spark.operators.survival import (
        weibull_fit,
    )

    rng = np.random.RandomState(8)
    k_true, lam_true = 1.8, 6.0  # hours
    n = 400
    durs = lam_true * rng.weibull(k_true, n)
    rows = []
    for i, dh in enumerate(durs):
        c = f"c{i}"
        rows.append((c, "m", T0 + dt.timedelta(hours=0.0), 0, 1.0))
        rows.append((c, "m",
                     T0 + dt.timedelta(hours=float(dh)), 1, 1.0))
    # frontier pusher so nothing near the frontier censors the sample
    rows.append(("cz", "m", T0 + dt.timedelta(days=30), 0, 1.0))
    rows.append(("cz", "m", T0 + dt.timedelta(days=31), 1, 1.0))
    df = spark.createDataFrame(rows, SERIES)
    r = weibull_fit(df, min_n=10).collect()[0]
    assert abs(r.shape - k_true) < 0.25
    assert abs(r.ln_scale_hours - math.log(lam_true)) < 0.15
    assert r.r2 > 0.95

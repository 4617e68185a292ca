"""Round-2b additions: ACF seasonality, SAX words, fixed-point BM25,
prefix-filtering Jaccard join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

BASE = dt.datetime(2024, 3, 1)


def _hourly_events(spark, counts_by_hour, metric="m"):
    """One event row per count unit at hour h (counts drive the ACF)."""
    rows = []
    eid = 0
    for h, c in enumerate(counts_by_hour):
        for k in range(c):
            rows.append(
                (str(1 + k % 3), metric, BASE + dt.timedelta(hours=h,
                                                             seconds=k),
                 eid, 1.0)
            )
            eid += 1
    return spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )


def test_acf_detects_planted_period(spark):
    from timeseriescorrelation_spark.operators.acf import (
        acf_spectrum, dominant_period,
    )

    # 8 repeats of a strong 12-hour pattern
    pattern = [9, 1, 1, 2, 1, 1, 7, 1, 2, 1, 1, 1]
    df = _hourly_events(spark, pattern * 8)
    spec = {r.lag_h: r.acf for r in acf_spectrum(df, max_lag=24).collect()}
    assert spec[12] > 0.9 and spec[24] > 0.9
    assert spec[12] > spec[6] and spec[12] > spec[1]
    top = dominant_period(df, max_lag=24).collect()
    assert len(top) == 1 and top[0].period_h == 12


def test_acf_zero_fills_missing_hours(spark):
    from timeseriescorrelation_spark.operators.acf import (
        hourly_counts_dense,
    )

    # hours 0, 3 present -> grid must cover 0..3 with zeros at 1, 2
    df = _hourly_events(spark, [2, 0, 0, 5])
    got = {
        int((r.h_us // 3_600_000_000) % 24): r.y
        for r in hourly_counts_dense(df).collect()
    }
    assert got == {0: 2, 1: 0, 2: 0, 3: 5}


def test_sax_word_matches_hand_computation(spark):
    from timeseriescorrelation_spark.operators.sax import sax_daily

    # one day, 4 hours, one point each: cents 100, 200, 300, 400
    # mean=250, std=sqrt(12500)=111.8; z = (-1.34, -0.45, .45, 1.34)
    # symbols: a (<-0.6745), b (<0), c (<0.6745 -> z=.45 -> c), d
    rows = [
        ("1", "m", BASE + dt.timedelta(hours=h), h, float(h + 1))
        for h in range(4)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = sax_daily(df).collect()
    assert len(out) == 1
    assert out[0].n_hours == 4
    assert out[0].sax_word == "abcd"


def test_sax_zero_variance_day_has_null_word(spark):
    from timeseriescorrelation_spark.operators.sax import sax_daily

    rows = [
        ("1", "m", BASE + dt.timedelta(hours=h), h, 7.0) for h in range(5)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = sax_daily(df).collect()
    assert len(out) == 1
    assert out[0].n_hours == 5 and out[0].sax_word is None


def test_bm25_ranking_properties(spark):
    from timeseriescorrelation_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [
            (1, "alpha beta alpha beta gamma"),   # 2 terms, high tf
            (2, "alpha beta delta delta delta"),  # 2 terms
            (3, "alpha delta delta delta delta"), # 1 term
            (4, "delta delta delta delta delta"), # 0 terms
            (5, "gamma alpha beta gamma gamma"),  # rare term x3
        ],
        "doc_id long, text string",
    )
    out = bm25_topk(docs, ["alpha", "beta", "gamma"], k=10).collect()
    ids = [r.doc_id for r in out]
    assert 4 not in ids                      # no query term -> no row
    assert ids == sorted(
        ids, key=lambda i: (-[r.score_u for r in out][ids.index(i)], i)
    )
    by_id = {r.doc_id: r for r in out}
    # gamma is rarest (df=2): doc 5 with 3x gamma outranks 1-term doc 3
    assert by_id[5].score_u > by_id[3].score_u
    assert by_id[1].n_terms == 3 and by_id[3].n_terms == 1
    # more matched terms at comparable tf wins
    assert by_id[1].score_u > by_id[2].score_u


def test_bm25_k_limit_and_determinism(spark):
    from timeseriescorrelation_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(i, "alpha beta") for i in range(30)], "doc_id long, text string"
    )
    out = bm25_topk(docs, ["alpha"], k=7).collect()
    # identical docs -> identical scores -> doc_id ascending tie-break
    assert [r.doc_id for r in out] == list(range(7))


def test_prefix_jaccard_equals_naive_inverted_index(spark, docs_fixture):
    from timeseriescorrelation_spark.operators.dedup import (
        ngram_jaccard_pairs, prefix_jaccard_pairs,
    )

    naive = {
        (r.id_a, r.id_b, r.inter_n, r.union_n)
        for r in ngram_jaccard_pairs(
            docs_fixture, n=3, min_inter=1
        ).where(
            F.lit(5) * F.col("inter_n") >= F.col("union_n")
        ).collect()
    }
    pref = {
        (r.id_a, r.id_b, r.inter_n, r.union_n)
        for r in prefix_jaccard_pairs(
            docs_fixture, n=3, tau_num=1, tau_den=5
        ).collect()
    }
    assert pref == naive and len(pref) > 0


def test_prefix_jaccard_survives_short_docs(spark):
    from timeseriescorrelation_spark.operators.dedup import (
        prefix_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "just two"), (2, "one"), (3, "a b c d e"), (4, "a b c d e")],
        "doc_id long, text string",
    )
    got = prefix_jaccard_pairs(docs, n=3, tau_num=1, tau_den=2).collect()
    assert {(r.id_a, r.id_b) for r in got} == {(3, 4)}


@pytest.fixture(scope="session")
def docs_fixture(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    df.cache()
    df.count()
    return df


def test_seasonal_naive_backtest_hand_computed(spark):
    from timeseriescorrelation_spark.operators.acf import (
        seasonal_naive_backtest,
    )

    # hourly totals (cents): h0=100, h1=200, h24=150, h25=200, h48=???
    # pairs: (h24 vs h0): |150-100|=50, (h25 vs h1): |200-200|=0
    rows = [
        ("1", "m", BASE, 0, 1.00),
        ("1", "m", BASE + dt.timedelta(hours=1), 1, 2.00),
        ("1", "m", BASE + dt.timedelta(hours=24), 2, 1.50),
        ("1", "m", BASE + dt.timedelta(hours=25), 3, 2.00),
        # h49 has no h25+24 partner forward; h49-24=h25 exists:
        ("1", "m", BASE + dt.timedelta(hours=49), 4, 3.00),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = seasonal_naive_backtest(df, period_hours=24).collect()
    assert len(out) == 1
    r = out[0]
    # eval points: h24 (vs h0), h25 (vs h1), h49 (vs h25)
    # |150-100| + |200-200| + |300-200| = 150 cents
    assert r.n_eval == 3 and r.sae_cents == 150
    assert r.mae_u == 150 * 1_000_000 // (3 * 100)   # 0.5 units avg
    # smape terms: 50/250, 0, 100/500 -> (200000 + 0 + 200000)/3
    assert r.smape_u == (200000 + 0 + 200000) // 3


def test_acf_constant_series_yields_null(spark):
    from timeseriescorrelation_spark.operators.acf import (
        acf_spectrum, dominant_period,
    )

    df = _hourly_events(spark, [3] * 30)  # zero variance at every lag
    spec = acf_spectrum(df, max_lag=6).collect()
    assert len(spec) == 6
    assert all(r.acf is None for r in spec)
    assert dominant_period(df, max_lag=6).collect() == []


def test_bm25_no_matching_terms_is_empty(spark):
    from timeseriescorrelation_spark.operators.bm25 import bm25_topk

    docs = spark.createDataFrame(
        [(1, "x y z"), (2, "p q")], "doc_id long, text string"
    )
    assert bm25_topk(docs, ["absent", "missing"], k=5).collect() == []


def test_sax_single_hour_day_is_midrange_symbol(spark):
    from timeseriescorrelation_spark.operators.sax import sax_daily

    # one hour with spread points: hour mean == day mean -> z=0 -> 'c'
    rows = [
        ("1", "m", BASE + dt.timedelta(minutes=k), k, float(k))
        for k in range(3)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double"
    )
    out = sax_daily(df).collect()
    assert len(out) == 1 and out[0].sax_word == "c"


def test_seasonal_strength_extremes(spark):
    from timeseriescorrelation_spark.operators.acf import seasonal_strength

    # hour 0 always 1.0, hour 1 always 3.0 -> profile explains ALL
    # variance (R2=1); a single cell with spread -> explains none
    strong = [
        ("1", "m", BASE, 0, 1.0),
        ("2", "m", BASE + dt.timedelta(minutes=5), 1, 1.0),
        ("1", "m", BASE + dt.timedelta(hours=1), 2, 3.0),
        ("2", "m", BASE + dt.timedelta(hours=1, minutes=5), 3, 3.0),
    ]
    noise = [
        ("1", "w", BASE, 0, 1.0),
        ("2", "w", BASE + dt.timedelta(minutes=5), 1, 3.0),
    ]
    df = spark.createDataFrame(
        strong + noise,
        "conv_id string, metric string, ts timestamp, "
        "turn_idx int, value double",
    )
    got = {r.metric: r.r2_u for r in seasonal_strength(df).collect()}
    assert got == {"m": 1_000_000, "w": 0}


def test_periodogram_recovers_injected_24h_amplitude(spark):
    from timeseriescorrelation_spark.operators.acf import periodogram
    import math

    # 14 full days of hourly counts 20 + round(10*cos(2*pi*t/24)):
    # every candidate period divides 336, so the 24h tone projects
    # onto the 24h probe only — amp(24) ~= 10, all others ~= 0
    counts = [20 + round(10 * math.cos(2 * math.pi * t / 24))
              for t in range(336)]
    got = {r.period_h: r.amp
           for r in periodogram(_hourly_events(spark, counts)).collect()}
    assert set(got) == {6, 8, 12, 24, 48, 84, 168}
    assert 9.5 < got[24] < 10.5
    for p in (6, 8, 12, 48, 84, 168):
        assert got[p] < 0.4, (p, got[p])


def test_hurst_separates_iid_from_trend(spark):
    from timeseriescorrelation_spark.operators.acf import hurst_rs

    import random

    rng = random.Random(3)
    rows = []
    eid = 0
    for h in range(512):
        # iid counts -> H near 0.5 (small-sample R/S bias pulls the
        # naive slope to ~0.55-0.6; Anis-Lloyd correction deliberately
        # omitted, documented)
        for _ in range(rng.randint(1, 20)):
            rows.append(("c", "iid",
                         BASE + dt.timedelta(hours=h, seconds=eid % 3000),
                         eid, 1.0))
            eid += 1
        # strong linear trend -> persistent, H near 1
        for _ in range(1 + h // 8):
            rows.append(("c", "trend",
                         BASE + dt.timedelta(hours=h, seconds=eid % 3000),
                         eid, 1.0))
            eid += 1
    df = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    got = {r.metric: r for r in hurst_rs(df).collect()}
    assert got["iid"].n_blocks == 60  # 32+16+8+4 full blocks
    assert 0.40 < got["iid"].hurst < 0.72
    assert got["trend"].hurst > 0.85
    assert got["trend"].hurst > got["iid"].hurst + 0.2


def test_zipf_fit_recovers_power_law(spark):
    from timeseriescorrelation_spark.operators.lm import zipf_fit

    # construct freq(r) = round(2000/r) for 30 tokens -> alpha ~ -1
    words = []
    for r in range(1, 31):
        words += [f"w{r:02d}"] * round(2000 / r)
    docs = spark.createDataFrame(
        [(0, " ".join(words))], "doc_id long, text string"
    )
    got = zipf_fit(docs, top_k=100).collect()[0]
    assert got.vocab == 30
    assert got.top_token == "w01"
    assert -1.05 < got.zipf_alpha < -0.95
    assert got.r2 > 0.99

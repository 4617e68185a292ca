"""Analytics suite: M4 downsampling, counter rate, trailing-window
anomaly z-score, autocorrelation, lagged cross-correlation,
latency percentiles — hand-built series with the nasty edges
(value ties, counter resets, spike-vs-own-baseline, shifted pairs)."""

from __future__ import annotations

import datetime as dt
import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.analytics import (
    anomaly_zscore,
    autocorr_lag1,
    counter_rate,
    lagged_xcorr,
    latency_percentiles,
    m4_downsample,
)

T0 = dt.datetime(2024, 3, 1, 12, 0, 0)

SERIES_SCHEMA = (
    "conv_id string, metric string, ts timestamp, turn_idx int, value double"
)


def _rows(offsets_vals, conv="c1", metric="m"):
    return [
        (conv, metric, T0 + dt.timedelta(seconds=s), i, float(v))
        for i, (s, v) in enumerate(offsets_vals)
    ]


def test_m4_picks_the_four_points(spark):
    # one hour bucket; min value is TIED (rows 1 and 3) -> the earlier
    # (ts, turn_idx) must win
    data = _rows([(0, 5.0), (60, 1.0), (120, 9.0), (180, 1.0), (240, 4.0)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    r = m4_downsample(df, "hour").collect()
    assert len(r) == 1
    row = r[0]
    assert row.v_first == 5.0 and row.ts_first == T0
    assert row.v_last == 4.0 and row.ts_last == T0 + dt.timedelta(seconds=240)
    assert row.v_min == 1.0
    assert row.ts_vmin == T0 + dt.timedelta(seconds=60)  # tie -> earliest
    assert row.v_max == 9.0
    assert row.ts_vmax == T0 + dt.timedelta(seconds=120)


def test_m4_same_ts_tiebreak_on_turn_idx(spark):
    # two rows at the SAME timestamp: packed key must break the tie by
    # turn_idx, deterministically
    data = [
        ("c1", "m", T0, 7, 3.0),
        ("c1", "m", T0, 2, 8.0),
    ]
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    row = m4_downsample(df, "hour").collect()[0]
    assert row.v_first == 8.0  # turn_idx 2 precedes 7
    assert row.v_last == 3.0


def test_counter_rate_clamps_resets_and_drops_first(spark):
    # values 10 -> 13 -> 2 (reset) -> 5: increases 3, 0, 3 = 6
    data = _rows([(0, 10.0), (60, 13.0), (120, 2.0), (180, 5.0)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    r = counter_rate(df, "hour").collect()
    assert len(r) == 1
    assert r[0].n_deltas == 3  # first row has no predecessor
    assert r[0].increase == pytest.approx(6.0)
    assert r[0].rate_per_s == pytest.approx(6.0 / 3600, abs=1e-6)


def test_anomaly_spike_flagged_not_baseline(spark):
    # flat baseline then a spike; the spike's own value must not be in
    # its baseline frame (strictly-preceding), so z is huge-but-finite
    # only via sigma>0 — use a gently noisy baseline
    vals = [(i * 60, 10.0 + (i % 2) * 0.2) for i in range(10)]
    vals.append((600, 50.0))
    df = spark.createDataFrame(_rows(vals), SERIES_SCHEMA)
    out = anomaly_zscore(df, range_seconds=3600, z_thresh=2.0, min_n=5)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].value == 50.0
    assert rows[0].z > 100  # (50 - ~10.1) / 0.1
    # baseline stats exclude the spike itself
    assert rows[0].mu == pytest.approx(10.1, abs=0.01)


def test_autocorr_alternating_is_negative(spark):
    vals = [(i * 60, float(i % 2)) for i in range(20)]
    df = spark.createDataFrame(_rows(vals), SERIES_SCHEMA)
    r = autocorr_lag1(df, min_n=10).collect()
    assert len(r) == 1
    assert r[0].r1 == pytest.approx(-1.0, abs=1e-6)


def test_autocorr_constant_series_guarded_out(spark):
    vals = [(i * 60, 7.0) for i in range(20)]
    df = spark.createDataFrame(_rows(vals), SERIES_SCHEMA)
    assert autocorr_lag1(df, min_n=10).count() == 0  # zero variance -> NULL


def test_lagged_xcorr_finds_the_shift(spark):
    # conv b repeats conv a's hourly pattern exactly 2 hours later:
    # within the overlap, r at lag_h=+2 (a leads b) must be ~1.0
    rng = np.random.RandomState(7)
    base = rng.rand(30) * 10
    rows = []
    for i, v in enumerate(base):
        rows.append(("a", "m", T0 + dt.timedelta(hours=i), i, float(v)))
        rows.append(
            ("b", "m", T0 + dt.timedelta(hours=i + 2), i, float(v))
        )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = lagged_xcorr(df, lags_h=[-2, -1, 0, 1, 2], min_n=5)
    best = {(r.ua, r.ub, r.lag_h): r.r for r in out.collect()}
    assert best[("a", "b", 2)] == pytest.approx(1.0, abs=1e-6)


def test_latency_percentiles_match_numpy(spark):
    gaps = [10, 20, 30, 40, 1000]  # seconds between consecutive points
    offs, acc = [], 0
    vals = [(0, 1.0)]
    for g in gaps:
        acc += g
        vals.append((acc, 1.0))
    df = spark.createDataFrame(_rows(vals), SERIES_SCHEMA)
    r = latency_percentiles(df, "day", [0.5, 0.95]).collect()
    assert len(r) == 1
    assert r[0].n == len(gaps)
    assert r[0].p5 == pytest.approx(
        float(np.percentile(gaps, 50)), abs=1e-4)
    assert r[0].p95 == pytest.approx(
        float(np.percentile(gaps, 95)), abs=1e-4)


def test_decontaminate_flags_overlap_and_survives_short_docs(spark):
    from timeseriescorrelation_spark.operators.dedup import decontaminate

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),   # shares trigram with bench
            (2, "completely different words entirely here"),
            (3, "too short"),                    # < n tokens: no shingles
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "quick brown fox of doom")], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_overlap for r in decontaminate(docs, bench, n=3).collect()}
    assert got == {1: 1}  # only 'quick brown fox' overlaps


def test_repetition_stats_hand_computed(spark):
    from timeseriescorrelation_spark.operators.textstats import (
        repetition_stats,
    )

    docs = spark.createDataFrame(
        [
            (1, "a b a b a"),   # toks: 5, distinct 2; 2grams: 4 ('a b','b a','a b','b a') distinct 2
            (2, "solo"),        # single token: no 2-grams -> NULL frac
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r1 = rows[1]
    assert (r1.n_toks, r1.n_distinct_toks) == (5, 2)
    assert r1.dup_tok_frac == pytest.approx(1 - 2 / 5, abs=1e-6)
    assert (r1.n_2grams,) == (4,)
    assert r1.dup_2gram_frac == pytest.approx(1 - 2 / 4, abs=1e-6)
    assert r1.top_tok_frac == pytest.approx(3 / 5, abs=1e-6)
    r2 = rows[2]
    assert r2.n_2grams == 0 and r2.dup_2gram_frac is None
    assert r2.top_tok_frac == pytest.approx(1.0, abs=1e-6)


def test_lagged_xcorr_blocked_equals_join(spark):
    """The BLAS block-pair kernel must reproduce the join formulation
    exactly (6dp-rounded) — including swapped-orientation lag signs
    across blocks and the zero-variance guard."""
    import pandas as pd

    from timeseriescorrelation_spark.operators.analytics import (
        lagged_xcorr_blocked,
    )

    rng = np.random.RandomState(11)
    rows = []
    for u in range(12):
        for i in range(40):
            if rng.rand() < 0.7:  # sparse presence, irregular overlap
                rows.append(
                    (f"u{u:02d}", "m", T0 + dt.timedelta(hours=i), i,
                     float(rng.rand() * 10 + (u % 3) * i * 0.1))
                )
    # one constant-valued series: must be guarded out by BOTH paths
    rows += [("zz", "m", T0 + dt.timedelta(hours=i), i, 5.0)
             for i in range(40)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    kw = dict(lags_h=[-2, -1, 0, 1, 2], min_n=5)
    a = lagged_xcorr(df, r_min=0.0, **kw).toPandas()
    b = lagged_xcorr_blocked(df, r_min=0.0, n_blocks=4, **kw).toPandas()
    key = ["ua", "ub", "lag_h"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert not a.empty
    assert ("zz" not in set(a.ua) | set(a.ub)
            and "zz" not in set(b.ua) | set(b.ub))
    m = a.merge(b, on=key, how="outer", suffixes=("_j", "_b"),
                indicator=True)
    assert (m["_merge"] == "both").all()
    pd.testing.assert_series_equal(m["n_j"], m["n_b"], check_names=False)
    assert (m["r_j"] - m["r_b"]).abs().max() == 0.0


def test_lagged_xcorr_pruned_recall_and_exactness(spark):
    """The magnitude-sketch prune + verify route must (a) report values
    IDENTICAL to the exact join operator for every pair it emits, and
    (b) find every circularly-shifted planted pair (where the DFT
    magnitude bound is exact) — while actually pruning the pair space."""
    import pandas as pd

    from timeseriescorrelation_spark.operators.analytics import (
        lagged_xcorr_pruned,
    )

    rng = np.random.RandomState(5)
    T = 48
    rows = []
    # 6 independent noise series
    for u in range(6):
        for i in range(T):
            rows.append((f"n{u}", "m", T0 + dt.timedelta(hours=i), i,
                         float(rng.rand() * 10)))
    # 3 planted pairs: b = a circularly shifted by 2h (full overlap in
    # the wrapped sense; linear overlap T-2 of T)
    for p in range(3):
        base = rng.rand(T) * 10
        shifted = np.roll(base, 2)
        for i in range(T):
            rows.append((f"p{p}a", "m", T0 + dt.timedelta(hours=i), i,
                         float(base[i])))
            rows.append((f"p{p}b", "m", T0 + dt.timedelta(hours=i), i,
                         float(shifted[i])))
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    kw = dict(lags_h=[-2, -1, 0, 1, 2], min_n=5, r_min=0.9)
    exact = lagged_xcorr(df, **kw).toPandas()
    pruned = lagged_xcorr_pruned(df, theta=0.5, **kw).toPandas()
    key = ["ua", "ub", "lag_h"]
    # (a) exactness on reported pairs
    m = pruned.merge(exact, on=key, suffixes=("_p", "_e"), how="left")
    assert m["r_e"].notna().all(), m
    assert (m["r_p"] - m["r_e"]).abs().max() == 0.0
    assert (m["n_p"] == m["n_e"]).all()
    # (b) recall on the planted pairs: a leads b by 2h -> lag +2
    got_pairs = set(zip(pruned.ua, pruned.ub, pruned.lag_h))
    for p in range(3):
        assert (f"p{p}a", f"p{p}b", 2) in got_pairs
    # and the grid really pruned: every planted pair found by exact
    # must also be in pruned (high-r recall), noise pairs mostly cut
    strong = exact[exact.r.abs() >= 0.95]
    strong_pairs = set(zip(strong.ua, strong.ub, strong.lag_h))
    assert strong_pairs <= got_pairs


def test_quantiles_bucketed_matches_numpy(spark):
    """Bounded-memory exact quantiles must equal numpy's linear
    interpolation over the quantized values — including the n=1 group
    and an exact-integer rank (q*(n-1) integral: no interpolation)."""
    from timeseriescorrelation_spark.operators.analytics import (
        quantiles_bucketed,
    )

    rng = np.random.RandomState(3)
    vals = list(rng.rand(101) * 50)  # n=101 -> q=0.5 lands exactly
    rows = [("a", float(v)) for v in vals] + [("b", 7.003)]
    df = spark.createDataFrame(rows, "metric string, value double")
    out = {
        (r.metric, r.q): (r.n, r.p)
        for r in quantiles_bucketed(
            df, ["metric"], [0.5, 0.9], precision=0.01
        ).collect()
    }
    qa = np.floor(np.array(vals) / 0.01)
    for q in (0.5, 0.9):
        n, p = out[("a", q)]
        assert n == 101
        assert p == pytest.approx(
            float(np.percentile(qa, q * 100)) * 0.01, abs=1e-6)
    # single-value group: every quantile is the value itself (quantized)
    assert out[("b", 0.5)] == (1, pytest.approx(7.0, abs=1e-9))


def test_lagged_xcorr_blocked_rejects_asymmetric_lags(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        lagged_xcorr_blocked,
    )

    df = spark.createDataFrame(
        [("a", "m", T0, 0, 1.0)], SERIES_SCHEMA
    )
    with pytest.raises(ValueError, match="symmetric lag set"):
        lagged_xcorr_blocked(df, lags_h=[1, 2])


def test_anomaly_sharded_equals_global(spark):
    """Day-sharded parallel windows must reproduce the global window
    row-for-row, including rows just after a shard boundary whose
    frame reaches into the previous shard, and same-ts peers AT the
    boundary."""
    from timeseriescorrelation_spark.operators.analytics import (
        anomaly_zscore_sharded,
    )

    rng = np.random.RandomState(9)
    rows = []
    # dense minutes straddling a UTC midnight: 23:00..01:00 over 3 days
    base = dt.datetime(2024, 3, 1, 22, 0, 0)
    i = 0
    for d in range(3):
        for m in range(0, 240, 7):  # 22:00 -> 02:00 every 7 min
            ts = base + dt.timedelta(days=d, minutes=m)
            v = float(rng.rand() * 4)
            if i % 37 == 0:
                v += 40.0  # planted spikes
            rows.append(("c", "m", ts, i, v))
            i += 1
    # same-ts peers exactly at midnight
    mid = dt.datetime(2024, 3, 2, 0, 0, 0)
    rows += [("c", "m", mid, 9001, 1.0), ("c", "m", mid, 9002, 99.0)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    kw = dict(range_seconds=3600, z_thresh=2.0, min_n=5, keys=["metric"])
    a = sorted(map(tuple, anomaly_zscore(df, **kw).collect()))
    b = sorted(map(tuple, anomaly_zscore_sharded(df, **kw).collect()))
    assert len(a) > 0
    assert a == b


def test_ewma_matches_explicit_recursion(spark):
    from timeseriescorrelation_spark.operators.analytics import ewma

    rng = np.random.RandomState(13)
    x = rng.rand(50) * 100
    rows = _rows([(i * 60, v) for i, v in enumerate(x)])
    got = (
        ewma(spark.createDataFrame(rows, SERIES_SCHEMA), alpha=0.3)
        .orderBy("turn_idx")
        .collect()
    )
    y = np.empty_like(x)
    y[0] = x[0]
    for i in range(1, len(x)):
        y[i] = 0.7 * y[i - 1] + 0.3 * x[i]
    want = np.floor(y * 1e6) / 1e6
    assert [r.ewma for r in got] == list(want)


def test_ewma_many_series_across_partitions(spark):
    """Regression: the grouped-ewm result must be aligned by original
    row index, not assumed to come back in appearance order — with
    many series hashed across partitions pandas returns group blocks
    in an internal order (this exact bug shipped briefly and only the
    oracle gate caught it)."""
    from timeseriescorrelation_spark.operators.analytics import ewma

    rng = np.random.RandomState(21)
    rows = []
    for u in range(40):
        for m in ("a", "b", "c"):
            for i in range(15):
                rows.append(
                    (f"u{u}", m, T0 + dt.timedelta(minutes=i), i,
                     float(rng.rand() * 100))
                )
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    got = ewma(df, alpha=0.3).toPandas()
    bad = 0
    for (c, m), g in got.groupby(["conv_id", "metric"]):
        g = g.sort_values("turn_idx")
        x = g["value"].to_numpy()
        r = np.empty_like(x)
        r[0] = x[0]
        for i in range(1, len(x)):
            r[i] = 0.7 * r[i - 1] + 0.3 * x[i]
        if not np.array_equal(
            g["ewma"].to_numpy(), np.floor(r * 1e6) / 1e6
        ):
            bad += 1
    assert bad == 0


def test_cusum_detects_mean_shift(spark):
    """A series with a level shift halfway must alert after the shift
    (and score s_plus growing), while an alternating no-drift series
    never alerts."""
    import datetime as dt

    from timeseriescorrelation_spark.operators.analytics import cusum

    t0 = dt.datetime(2024, 1, 1)
    shift = [
        ("c1", "m", t0 + dt.timedelta(minutes=i), i,
         10.0 if i < 30 else 20.0)
        for i in range(60)
    ]
    flat = [
        ("c2", "m", t0 + dt.timedelta(minutes=i), i,
         10.0 if i % 2 else 10.5)
        for i in range(60)
    ]
    df = spark.createDataFrame(
        shift + flat,
        "conv_id string, metric string, ts timestamp, turn_idx int, "
        "value double",
    )
    rows = cusum(df, h=5.0).collect()
    by = {}
    for r in rows:
        by.setdefault(r.conv_id, []).append(r)
    assert any(r.alert for r in by["c1"])          # shift detected
    assert not any(r.alert for r in by["c2"])      # no false alarm
    # the upward shift accumulates on the plus side toward the tail
    s = sorted(by["c1"], key=lambda r: r.turn_idx)
    assert s[-1].s_plus > s[5].s_plus


def test_mann_kendall_hand_computed(spark):
    import datetime as dt
    import math

    from timeseriescorrelation_spark.operators.analytics import (
        mann_kendall_daily,
    )

    base = dt.datetime(2024, 6, 1)
    inc = [  # strictly increasing: S = C(8,2) = 28, no ties
        ("1", "up", base + dt.timedelta(minutes=i), i, float(i + 1))
        for i in range(8)
    ]
    flat = [  # all equal: S = 0, tie term kills the variance -> z NULL
        ("1", "fl", base + dt.timedelta(minutes=i), i, 7.0)
        for i in range(8)
    ]
    df = spark.createDataFrame(
        inc + flat,
        "conv_id string, metric string, ts timestamp, "
        "turn_idx int, value double",
    )
    got = {r.metric: r for r in mann_kendall_daily(df).collect()}
    up = got["up"]
    assert up.n == 8 and up.s_stat == 28
    var = 8 * 7 * 21 / 18.0
    assert up.z == round(27 / math.sqrt(var), 6)
    fl = got["fl"]
    assert fl.s_stat == 0 and fl.z is None


def test_trimmed_mean_drops_tails(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        trimmed_mean,
    )

    # 10 values: 0..8 plus one 1000-outlier -> k = 1 trims the single
    # min and max, kept mean = (1+..+8)/8 = 4.5; the plain mean would
    # be ~104
    data = _rows([(i * 60, float(i)) for i in range(9)] + [(540, 1000.0)])
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    out = trimmed_mean(df, trim=0.1).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n, r.n_kept, r.mean_trimmed) == (10, 8, 4.5)


def test_peak_census_strict_interior_maxima(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        peak_census,
    )

    # hourly means 1,5,2,7,3: peaks at h1 (drop 5-2=3) and h3 (7-3=4);
    # boundary hours never qualify
    vals = [1.0, 5.0, 2.0, 7.0, 3.0]
    data = [
        ("c", "m", T0 + dt.timedelta(hours=h), h, v)
        for h, v in enumerate(vals)
    ]
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    out = sorted(peak_census(df).collect(), key=lambda r: r.peak_ts)
    assert [(r.peak_ts.hour, r.mean_v, r.drop) for r in out] == [
        (13, 5.0, 3.0), (15, 7.0, 4.0),
    ]


def test_dow_anova_hand_computed(spark):
    from timeseriescorrelation_spark.operators.decompose import dow_anova

    # two day-of-week groups, 4 hourly points each:
    # Mon [1,1,3,3], Tue [5,5,7,7] (cents: x100)
    # SSB = 320000, SSW = 80000, F = (320000/1)/(80000/6) = 24.0
    mon = dt.datetime(2024, 3, 4)
    tue = dt.datetime(2024, 3, 5)
    data = []
    for i, v in enumerate([1.0, 1.0, 3.0, 3.0]):
        data.append(("c", "m", mon + dt.timedelta(hours=i), i, v))
    for i, v in enumerate([5.0, 5.0, 7.0, 7.0]):
        data.append(("c", "m", tue + dt.timedelta(hours=i), i, v))
    df = spark.createDataFrame(data, SERIES_SCHEMA)
    out = dow_anova(df).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_obs, r.k_groups, r.ssb_u, r.ssw_u, r.f_stat) == (
        8, 2, 320_000, 80_000, 24.0,
    )


def test_proportion_wilson_hand_computed(spark):
    import math

    from timeseriescorrelation_spark.operators.analytics import (
        proportion_wilson,
    )

    # day 1: 1 error in 4; day 2: 0 errors in 5 (interval must still
    # have width -- the naive p±z√(pq/n) collapses to a point at p=0)
    data = []
    for i, et in enumerate(["error", "view", "view", "view"]):
        data.append((i, T0 + dt.timedelta(minutes=i), 1, et, 1.0))
    d2 = T0 + dt.timedelta(days=1)
    for i in range(5):
        data.append((10 + i, d2 + dt.timedelta(minutes=i), 1, "view", 1.0))
    ev = spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double",
    )
    got = {
        r.bucket_ts.day: r
        for r in proportion_wilson(ev, F.col("event_type") == "error"
                                   ).collect()
    }
    z = 1.959963984540054
    p, n = 0.25, 4.0
    denom = 1 + z * z / n
    center = (p + z * z / (2 * n)) / denom
    hw = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n)) / denom
    assert got[1].p == 0.25
    assert got[1].ci_lo == round(max(0.0, center - hw), 6)
    assert got[1].ci_hi == round(min(1.0, center + hw), 6)
    assert got[2].p == 0.0 and got[2].ci_lo == 0.0
    assert got[2].ci_hi > 0.4  # n=5 zero-rate still genuinely uncertain


def test_cvar_daily_tie_invariant(spark):
    """n=40 points, k=ceil(40/20)=2: VaR = 2nd-largest cents, CVaR =
    mean of the top 2 — with THREE ties at the boundary value so any
    row_number tie order must give the same answer (order-statistic
    functional)."""
    import datetime as dt

    from timeseriescorrelation_spark.operators.analytics import cvar_daily

    base = dt.datetime(2024, 1, 1)
    vals = [9.0] + [5.0] * 3 + [1.0] * 36   # top2 = {9.00, 5.00}
    rows = [
        ("c1", "m", base + dt.timedelta(minutes=i), i, v)
        for i, v in enumerate(vals)
    ]
    s = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    out = cvar_daily(s, alpha_denom=20).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n_points, r.k_tail) == (40, 2)
    assert r.var_amt == 5.0
    assert r.cvar_amt == 7.0   # (900+500)/(100*2)


def test_markov_accuracy_hand_computed(spark):
    """10-day span, split at day 6 (3/5 of 10): train teaches a->b
    (2:1 over a->c); eval has three a->? transitions of which two are
    a->b -> accuracy 2/3 for antecedent 'a'."""
    import datetime as dt

    from timeseriescorrelation_spark.operators.analytics import (
        markov_accuracy,
    )

    d = dt.datetime
    rows = []

    def seq(conv, day, events):
        for i, ev in enumerate(events):
            rows.append(
                (conv, ev, d(2024, 1, day, 10, i), len(rows), 1.0)
            )

    # train side (days 1-5): a->b twice, a->c once
    seq("c1", 1, ["a", "b"])
    seq("c2", 2, ["a", "b"])
    seq("c3", 3, ["a", "c"])
    # eval side (days 7-9): a->b, a->b, a->c
    seq("c4", 7, ["a", "b"])
    seq("c5", 8, ["a", "b"])
    seq("c6", 9, ["a", "c"])
    # pin the day span to 10 days
    rows.append(("c0", "z", d(2024, 1, 11, 0, 0), len(rows), 1.0))
    s = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    got = {r.prev: r for r in markov_accuracy(s).collect()}
    assert got["a"].pred == "b"
    assert got["a"].n_eval == 3 and got["a"].n_hit == 2
    assert got["a"].accuracy == 0.666667


def test_did_readout_recovers_injected_effect(spark):
    """Per-unit values constant in pre; in post, arm-B units (derived
    with the SAME md5 rule as ab_assign) get +7.00 — DiD must recover
    exactly 7.0, arms must have both periods populated, and z must be
    huge (zero within-cell variance is avoided by a tiny per-unit
    offset that cancels in the means)."""
    import datetime as dt
    import hashlib

    from timeseriescorrelation_spark.operators.abtest import did_readout

    def arm(u):
        return "B" if int(
            hashlib.md5(u.encode()).hexdigest()[:4], 16) < 32768 else "A"

    base = dt.datetime(2024, 5, 1)
    rows = []
    units = [f"u{i}" for i in range(40)]
    for ui, u in enumerate(units):
        jitter = (ui % 5) - 2          # per-unit level, same pre/post
        for day in (0, 1, 2, 9, 10, 11):   # split at day 6 of 0..11
            v = 50.0 + jitter
            if day >= 6 and arm(u) == "B":
                v += 7.0
            rows.append(
                (u, "m", base + dt.timedelta(days=day, hours=ui % 24),
                 len(rows), v)
            )
    s = spark.createDataFrame(
        rows, "conv_id string, metric string, ts timestamp, "
              "turn_idx int, value double")
    r = did_readout(s).collect()[0]
    assert r.n_a_pre > 5 and r.n_b_pre > 5
    assert r.n_a_pre == r.n_a_post and r.n_b_pre == r.n_b_post
    assert r.did == 7.0
    assert abs(r.mean_b_post - r.mean_b_pre - 7.0) < 1e-6


def test_slo_burn_multiwindow_gate(spark, tmp_path):
    """Hand-built hours: a 20%-error hour after five clean heavy hours
    must NOT page (slow window healthy); the same 20%-error hour at
    the end of a six-hour dirty stretch must page — the multi-window
    burn rule."""
    import datetime as dt
    import os

    import __spark_entry__ as em

    base = dt.datetime(2024, 2, 1)
    rows = []

    def hour(h, n_ok, n_err):
        for i in range(n_ok):
            rows.append((len(rows), base + dt.timedelta(hours=h, minutes=i % 60), i, "view", 1.0))
        for i in range(n_err):
            rows.append((len(rows), base + dt.timedelta(hours=h, minutes=i % 60), i, "error", 1.0))

    for h in range(5):            # clean heavy stretch
        hour(h, 400, 0)
    hour(5, 80, 20)               # blip: fast burn 20x, slow window ok
    for h in range(20, 26):       # sustained dirty stretch
        hour(h, 80, 20)
    events = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id int, "
              "event_type string, value double")
    d = str(tmp_path)
    events.write.mode("overwrite").parquet(os.path.join(d, "events.parquet"))
    got = {r.hour_ts: r for r in em.q_slo_burn(spark, d).collect()}

    def at(h):
        return got[base + dt.timedelta(hours=h)]

    assert at(5).burn_1h == 20.0 and not at(5).page
    assert at(25).burn_1h == 20.0 and at(25).page
    assert not at(0).page and not at(4).page


def test_apdex_bands_and_edge(spark):
    from timeseriescorrelation_spark.operators.analytics import apdex_hourly

    # one hour, T=50: 46 satisfied (<=50), 2 tolerating (<=200),
    # 2 frustrated -> apdex = (46 + 2/2)/50 = 0.94 EXACTLY on the
    # excellent band edge (the integer cross-multiplication must
    # classify it 'excellent', not fall to 'good' on a float wobble).
    vals = [10.0] * 46 + [100.0] * 2 + [500.0] * 2
    rows = [
        ("c", "m", T0 + dt.timedelta(seconds=i), i, v)
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = apdex_hourly(df, threshold=50.0).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["satisfied"], r["tolerating"]) == (50, 46, 2)
    assert r["apdex"] == pytest.approx(0.94)
    assert r["rating"] == "excellent"

    # all frustrated -> 0.0 / unacceptable; threshold boundary value
    # 50.00 itself counts satisfied (<= T on integer cents)
    rows2 = [
        ("c", "m", T0 + dt.timedelta(seconds=i), i, 50.0 if i < 3 else 999.0)
        for i in range(10)
    ]
    out2 = apdex_hourly(
        spark.createDataFrame(rows2, SERIES_SCHEMA), threshold=50.0
    ).collect()[0]
    assert out2["satisfied"] == 3
    assert out2["apdex"] == pytest.approx(0.3)
    assert out2["rating"] == "unacceptable"


def test_isotonic_pava_pools_violators(spark):
    from timeseriescorrelation_spark.operators.abtest import (
        isotonic_calibration,
    )

    # 4 score bins, equal n=10; raw rates 0.1, 0.5, 0.3, 0.7:
    # the (0.5, 0.3) violator pair pools to 0.4
    def bin_rows(score, successes, n=10):
        return [(score, 1 if i < successes else 0) for i in range(n)]

    rows = (
        bin_rows(0.1, 1) + bin_rows(0.2, 5)
        + bin_rows(0.3, 3) + bin_rows(0.4, 7)
    )
    df = spark.createDataFrame(rows, "score double, outcome int")
    out = sorted(
        isotonic_calibration(df).collect(), key=lambda r: r["score"]
    )
    assert [r["rate_raw"] for r in out] == [0.1, 0.5, 0.3, 0.7]
    assert [r["rate_iso"] for r in out] == [0.1, 0.4, 0.4, 0.7]
    # monotone non-decreasing and mass-conserving inside the pool
    isos = [r["rate_iso"] for r in out]
    assert all(a <= b for a, b in zip(isos, isos[1:]))


def test_isotonic_cascade_pool(spark):
    from timeseriescorrelation_spark.operators.abtest import (
        isotonic_calibration,
    )

    # strictly decreasing rates -> everything pools to the grand mean
    rows = []
    for score, succ in [(0.2, 9), (0.4, 6), (0.6, 3), (0.8, 2)]:
        rows += [(score, 1 if i < succ else 0) for i in range(10)]
    df = spark.createDataFrame(rows, "score double, outcome int")
    out = isotonic_calibration(df).collect()
    assert all(r["rate_iso"] == 0.5 for r in out)  # 20/40


def test_capacity_projection_exact_linear(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        capacity_projection,
    )

    # metric g: exactly +100 cents/day from 1000; metric f: flat
    rows = []
    for d in range(10):
        ts = dt.datetime(2024, 3, 1 + d, 9, 0, 0)
        rows.append(("c", "g", ts, d, (1000 + 100 * d) / 100.0))
        rows.append(("c", "f", ts, d, 7.0))
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    out = {r["metric"]: r for r in capacity_projection(df).collect()}
    g = out["g"]
    assert g["slope_cents_per_day"] == pytest.approx(100.0, abs=1e-6)
    assert g["level_now"] == pytest.approx(1900.0, abs=1e-6)
    assert g["target_cents"] == 2 * 1900
    # (3800 - 1900) / 100 = 19 days
    assert g["days_to_2x"] == pytest.approx(19.0, abs=1e-6)
    # flat trend -> no projection
    assert out["f"]["days_to_2x"] is None


def test_seasonal_mk_monotone_ramp_hand_value(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    # 28 consecutive ascending days: each weekday stratum holds 4
    # ascending values -> S_g = 6 each, S = 42; var = 7*4*3*13/18;
    # z = 41/sqrt(1092/18)
    rows = [("c", "m", T0 + dt.timedelta(days=i), 0, float(i))
            for i in range(28)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = seasonal_mann_kendall(df).collect()
    assert len(r) == 1
    r = r[0]
    assert r.n_days == 28 and r.n_strata == 7
    assert r.s_stat == 42
    assert r.z == pytest.approx(41.0 / math.sqrt(1092.0 / 18.0),
                                abs=2e-6)


def test_seasonal_mk_pure_weekly_cycle_no_trend(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    # value depends ONLY on the weekday: every stratum is constant
    # -> S = 0 and Var = 0 (all ties) -> z NULL; the unstratified
    # test would see nonzero sign terms from the cycle itself
    rows = [("c", "m", T0 + dt.timedelta(days=i), 0,
             float((T0 + dt.timedelta(days=i)).weekday()))
            for i in range(28)]
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    r = seasonal_mann_kendall(df).collect()[0]
    assert r.s_stat == 0 and r.z is None


def test_seasonal_mk_min_days_filter(spark):
    from timeseriescorrelation_spark.operators.analytics import (
        seasonal_mann_kendall,
    )

    rows = [("c", "m", T0 + dt.timedelta(days=i), 0, float(i))
            for i in range(14)]  # < 21 days
    df = spark.createDataFrame(rows, SERIES_SCHEMA)
    assert seasonal_mann_kendall(df).count() == 0


def test_forecast_baselines_snaive_out_of_sample_small_season(spark):
    """r4 advice: with season < horizon, snaive must repeat the LAST
    TRAIN season (lag k*season back into train), never reference other
    holdout actuals.  Train is constant 10.0, holdout constant 50.0:
    a leaky t-season lag would predict 50 from other test rows (error
    0 for late ranks); the correct multi-step snaive always predicts
    10 -> MAE exactly 40 over all 12 holdout hours."""
    from timeseriescorrelation_spark.operators.analytics import (
        forecast_baselines,
    )

    t0 = dt.datetime(2026, 3, 1)
    rows = []
    for i in range(36):  # 24 train + 12 holdout hours
        v = 10.0 if i < 24 else 50.0
        rows.append(("m", t0 + dt.timedelta(hours=i), v))
    df = spark.createDataFrame(
        rows, "metric string, ts timestamp, value double"
    )
    out = forecast_baselines(
        df, horizon=12, season=6, min_train=12
    ).collect()
    sn = {r["model"]: r for r in out}["snaive"]
    assert sn["n_test"] == 12
    assert sn["mae"] == 40.0
    # default season == horizon stays the plain one-season lag
    out24 = forecast_baselines(df, horizon=12, season=12, min_train=12)
    sn24 = {r["model"]: r for r in out24.collect()}["snaive"]
    assert sn24["mae"] == 40.0

"""KMV overlap sketch (operators/sketches.kmv_overlap): exact when
segment cardinalities are below k; estimates within theoretical
tolerance above k; intersection degenerates correctly for disjoint
segments."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.sketches import kmv_overlap

SCHEMA = "seg string, item long"


def _mk(spark, seg_items):
    rows = [(s, i) for s, items in seg_items.items() for i in items]
    return spark.createDataFrame(rows, SCHEMA)


def test_exact_below_k(spark):
    # |A|=30, |B|=25, |A∩B|=10 — all below k=64, so every estimate is
    # exact (the sketches hold the full sets).
    a = set(range(100, 130))
    b = set(range(120, 145))
    df = _mk(spark, {"a": a, "b": b})
    r = kmv_overlap(df, "seg", "item", k=64).collect()[0]
    assert r.est_a == 30.0 and r.est_b == 25.0
    assert r.est_union == 45.0
    assert abs(r.est_inter - 10.0) < 1e-9
    assert abs(r.est_jaccard - 10 / 45) < 1e-6


def test_disjoint_segments(spark):
    df = _mk(spark, {"a": range(0, 40), "b": range(1000, 1040)})
    r = kmv_overlap(df, "seg", "item", k=64).collect()[0]
    assert r.est_inter == 0.0 and r.est_jaccard == 0.0


def test_estimates_above_k(spark):
    # |A|=|B|=2000, |A∩B|=1000 (J=1/3): k=64 gives ~12% rel-err on
    # cardinalities and ~1/sqrt(k)≈12.5% absolute on Jaccard; assert
    # generous 3-sigma-ish bounds (the hash family is fixed, so this
    # is a deterministic regression pin, not a flaky statistical one).
    a = set(range(0, 2000))
    b = set(range(1000, 3000))
    df = _mk(spark, {"a": a, "b": b})
    r = kmv_overlap(df, "seg", "item", k=64).collect()[0]
    for est, true in ((r.est_a, 2000), (r.est_b, 2000),
                      (r.est_union, 3000)):
        assert abs(est - true) / true < 0.4, (est, true)
    assert abs(r.est_jaccard - 1 / 3) < 0.2
    assert abs(r.est_inter - 1000) / 1000 < 0.6


def test_duplicates_ignored(spark):
    rows = [("a", 1), ("a", 1), ("a", 2), ("b", 1), ("b", 1)]
    df = spark.createDataFrame(rows, SCHEMA)
    r = kmv_overlap(df, "seg", "item", k=8).collect()[0]
    assert r.est_a == 2.0 and r.est_b == 1.0 and r.est_inter == 1.0

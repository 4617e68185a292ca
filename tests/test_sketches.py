"""HLL sketches: merge must equal sketch-of-union (the property that
makes tiered distinct counts composable), and estimates must land
within the theoretical error bounds on known cardinalities.  Exact
cross-engine replication of the estimate is covered by the oracle
gate (`hll_distinct_day`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.sketches import (
    hll_estimate,
    hll_merge,
    hll_sketch,
)


def _items(spark, names, grp):
    return spark.createDataFrame(
        [(grp, n) for n in names], "g string, item string"
    )


def test_merge_equals_sketch_of_union(spark):
    a = _items(spark, [f"x{i}" for i in range(500)], "a")
    b = _items(spark, [f"x{i}" for i in range(300, 900)], "b")
    # per-part sketches keyed by g, merged with g dropped
    parts = hll_sketch(a.unionAll(b), ["g"], "item")
    merged = {
        (r["reg"],): r["rho"]
        for r in hll_merge(parts.drop("g").withColumn("k", F.lit(1)),
                           ["k"]).collect()
    }
    direct = {
        (r["reg"],): r["rho"]
        for r in hll_sketch(
            a.unionAll(b).select("item").distinct().withColumn(
                "k", F.lit(1)
            ),
            ["k"], "item",
        ).collect()
    }
    assert merged == direct


def test_estimate_within_bounds(spark):
    # m=1024 -> stderr ~3.25%; 2000 distinct items should estimate
    # within 4 sigma (13%)
    df = _items(spark, [f"item-{i}" for i in range(2000)], "g")
    est = hll_estimate(hll_sketch(df, ["g"], "item"), ["g"]).collect()
    assert len(est) == 1
    assert abs(est[0]["hll_est"] - 2000) / 2000 < 0.13


def test_small_range_linear_counting(spark):
    # tiny cardinalities take the linear-counting branch, which is
    # near-exact when most registers are empty
    df = _items(spark, [f"u{i}" for i in range(40)], "g")
    est = hll_estimate(hll_sketch(df, ["g"], "item"), ["g"]).collect()
    assert abs(est[0]["hll_est"] - 40) < 5


def test_duplicates_do_not_inflate(spark):
    # 100 distinct items repeated 50x each: same sketch as one copy
    rows = [("g", f"d{i % 100}") for i in range(5000)]
    df = spark.createDataFrame(rows, "g string, item string")
    one = spark.createDataFrame(
        [("g", f"d{i}") for i in range(100)], "g string, item string"
    )
    s_dup = {(r["reg"],): r["rho"]
             for r in hll_sketch(df, ["g"], "item").collect()}
    s_one = {(r["reg"],): r["rho"]
             for r in hll_sketch(one, ["g"], "item").collect()}
    assert s_dup == s_one

"""Integer fixed-point PageRank: hand-unrolled 3-iteration oracle on a
tiny graph with a dangling node."""

from __future__ import annotations


def test_pagerank_hand_unrolled(spark):
    from timeseriescorrelation_spark.operators.graphrank import (
        pagerank_fixedpoint,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 1), ("a", "c", 1)],
        "src string, dst string, w int",
    )
    got = {
        r.node: r.pr_u
        for r in pagerank_fixedpoint(edges, n_iter=3).collect()
    }
    # wout: a=2, b=1; c dangling (its mass vanishes — documented)
    # p1: a=150000+850000, b=c=150000+425000
    # p2: a=150000+(85*575000)//100, b=c=150000+425000
    # p3: a unchanged, b=c=150000+(85*638750)//200
    assert got == {"a": 638750, "b": 421468, "c": 421468}


def test_pagerank_cycle_is_uniform(spark):
    from timeseriescorrelation_spark.operators.graphrank import (
        pagerank_fixedpoint,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1)],
        "src string, dst string, w int",
    )
    got = {
        r.node: r.pr_u
        for r in pagerank_fixedpoint(edges, n_iter=4).collect()
    }
    # symmetric cycle: uniform start stays the fixed point 10^6/node
    assert got == {"a": 1_000_000, "b": 1_000_000, "c": 1_000_000}

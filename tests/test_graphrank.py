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


def test_pagerank_conserving_total_mass(spark):
    """Graph with a GENUINE dangling node (4 has no out-edges): total
    mass must equal 10^6 * |V| exactly after every iteration, and
    the dangling node's inherited rank must flow back into the pool
    rather than vanish (node 1, pointed to by everyone, still ranks
    highest)."""
    from timeseriescorrelation_spark.operators.graphrank import (
        M_U,
        pagerank_conserving,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2), ("a", "z", 1),
         ("b", "z", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )  # z is dangling; c has no in-edges
    n_nodes = 4
    for k in (1, 2, 3, 5):
        rows = pagerank_conserving(edges, n_iter=k).collect()
        total = sum(r["pr_u"] for r in rows)
        assert total == M_U * n_nodes, (k, total)
    pr = {r["node"]: r["pr_u"] for r in rows}
    # a receives from b (heavier edge) and c; z only inherits -> a > z
    assert pr["a"] == max(pr.values())
    # c has no in-edges: only the uniform pool share
    assert pr["c"] == min(pr.values())


def test_pagerank_fixedpoint_loses_dangling_mass(spark):
    """Contrast check: the plain fixedpoint variant documents that
    dangling mass vanishes — totals drop below 10^6 * |V| on the same
    graph, which is exactly the defect pagerank_conserving closes."""
    from timeseriescorrelation_spark.operators.graphrank import (
        M_U,
        pagerank_fixedpoint,
    )

    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "a", 2), ("a", "z", 1),
         ("b", "z", 1), ("c", "a", 1)],
        "src string, dst string, w long",
    )
    rows = pagerank_fixedpoint(edges, n_iter=3).collect()
    assert sum(r["pr_u"] for r in rows) < M_U * 4


def test_bfs_depths_chain_and_early_exit(spark):
    from timeseriescorrelation_spark.operators.graphrank import bfs_depths

    # chain 1-2-3-4, triangle 2-5, island 9-10 (unreachable)
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (2, 5), (9, 10)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r.node: r.depth for r in bfs_depths(edges, seeds).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 5: 2, 4: 3}
    # max_depth clips the frontier
    clipped = {
        r.node: r.depth
        for r in bfs_depths(edges, seeds, max_depth=1).collect()
    }
    assert clipped == {1: 0, 2: 1}

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


def test_kcore_parallel_peel_converges(spark):
    """Two triangles joined by a bridge: the 2-core is both triangles
    (bridge endpoints survive, their degree includes the bridge);
    the 3-core is empty.  n_rounds beyond the peel depth must be a
    no-op (fixed point), and kcore_peel must report degrees inside
    the survivor set, not raw degrees."""
    from timeseriescorrelation_spark.operators.graphrank import kcore_peel

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "a"),
         ("d", "e"), ("e", "f"), ("f", "d"),
         ("c", "d"),                       # bridge
         ("f", "g")],                      # pendant leaf g
        "src string, dst string",
    )
    got = {
        r.node: r.core_deg for r in kcore_peel(edges, 2, 5).collect()
    }
    assert got == {"a": 2, "b": 2, "c": 3, "d": 3, "e": 2, "f": 2}
    assert kcore_peel(edges, 3, 8).count() == 0


def test_kcore_chain_peels_inward(spark):
    """A path graph has an empty 2-core but parallel peeling takes
    ceil(n/2) rounds (both ends peel simultaneously): bounded
    n_rounds exposes the intermediate survivor set exactly."""
    from timeseriescorrelation_spark.operators.graphrank import kcore_peel

    path = [(str(i), str(i + 1)) for i in range(6)]  # 0-1-...-6
    edges = spark.createDataFrame(path, "src string, dst string")
    after1 = {r.node for r in kcore_peel(edges, 2, 1).collect()}
    assert after1 == {"1", "2", "3", "4", "5"}
    assert kcore_peel(edges, 2, 4).count() == 0


def test_adamic_adar_hand_computed(spark):
    """Square a-b-c-d-a: every adjacent pair shares 0 neighbors, the
    two diagonals share 2 (all degrees 2).  ln 2 micro-nat snap:
    L = 693147, aa_w = 10^12 // 693147 = 1442695, ra_w = 5*10^11."""
    from timeseriescorrelation_spark.operators.graphrank import (
        adamic_adar_scores,
    )

    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("a", "d")],
        "src string, dst string",
    )
    rows = adamic_adar_scores(edges, top_k=10).collect()
    got = {(r.u, r.v): (r.common_n, r.ra_p, r.aa_p) for r in rows}
    assert got == {
        ("a", "c"): (2, 10**12, 2 * 1442695),
        ("b", "d"): (2, 10**12, 2 * 1442695),
    }


def test_label_propagation_two_cliques(spark):
    """Two 4-cliques joined by one bridge edge: sync LPA with min-tie
    converges to each clique's minimum node id; the bridge endpoints
    stay with their own clique (3 same-clique votes vs 1 across)."""
    from timeseriescorrelation_spark.operators.graphrank import (
        label_propagation,
    )

    def clique(ids):
        return [(a, b) for a in ids for b in ids if a < b]

    edges = spark.createDataFrame(
        clique([1, 2, 3, 4]) + clique([10, 11, 12, 13]) + [(4, 10)],
        "src long, dst long",
    )
    got = {r.node: r.lbl for r in label_propagation(edges, 4).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 13: 10}

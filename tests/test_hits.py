"""Integer HITS (operators/graphrank.hits_fixedpoint): closed forms
on a star (leaves are the only hubs, center the only authority) and a
chain (exact micro-unit halves)."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.graphrank import hits_fixedpoint

EDGE_SCHEMA = "src string, dst string, w long"


def test_star_graph(spark):
    leaves = [f"l{i}" for i in range(5)]
    edges = spark.createDataFrame(
        [(v, "center", 1) for v in leaves], EDGE_SCHEMA
    )
    out = {r.node: (r.hub_u, r.auth_u) for r in
           hits_fixedpoint(edges, n_iter=2).collect()}
    # all hub mass on the leaves (1e6 DIV 5 each), all authority on
    # the center
    assert out["center"] == (0, 1_000_000)
    for v in leaves:
        assert out[v] == (200_000, 0)


def test_chain_graph(spark):
    edges = spark.createDataFrame(
        [("a", "b", 1), ("b", "c", 1)], EDGE_SCHEMA
    )
    out = {r.node: (r.hub_u, r.auth_u) for r in
           hits_fixedpoint(edges, n_iter=2).collect()}
    assert out["a"] == (500_000, 0)
    assert out["b"] == (500_000, 500_000)
    assert out["c"] == (0, 500_000)


def test_weights_shift_authority(spark):
    # two hubs point at two authorities; the heavier edge wins
    edges = spark.createDataFrame(
        [("h1", "x", 3), ("h1", "y", 1), ("h2", "x", 3), ("h2", "y", 1)],
        EDGE_SCHEMA,
    )
    out = {r.node: (r.hub_u, r.auth_u) for r in
           hits_fixedpoint(edges, n_iter=2).collect()}
    assert out["x"][1] > out["y"][1]
    assert out["h1"] == out["h2"]  # symmetric hubs

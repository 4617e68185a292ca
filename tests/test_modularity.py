"""Newman modularity (operators/graphrank.modularity): hand-computed
two-triangle-bridge value, zero-internal-edge communities via the left
join, and composition with label_propagation covers every node."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.graphrank import (
    label_propagation,
    modularity,
)

E_SCHEMA = "src long, dst long"
L_SCHEMA = "node long, lbl long"


def test_two_triangles_bridge(spark):
    # triangles {0,1,2} and {3,4,5} joined by 2-3; Q = 2*35/196.
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        E_SCHEMA,
    )
    labels = spark.createDataFrame(
        [(n, 0) for n in (0, 1, 2)] + [(n, 1) for n in (3, 4, 5)],
        L_SCHEMA,
    )
    out = {r.lbl: r for r in modularity(edges, labels).collect()}
    for lbl in (0, 1):
        r = out[lbl]
        assert r.n_nodes == 3 and r.e_in == 3 and r.deg_sum == 7
        assert abs(r.q_contrib - 35 / 196) < 1e-6
    assert abs(sum(r.q_contrib for r in out.values()) - 0.357143) < 1e-4


def test_no_internal_edges_community(spark):
    edges = spark.createDataFrame([(0, 1), (0, 2)], E_SCHEMA)
    labels = spark.createDataFrame([(0, 9), (1, 5), (2, 5)], L_SCHEMA)
    out = {r.lbl: r for r in modularity(edges, labels).collect()}
    assert out[9].e_in == 0 and out[9].deg_sum == 2
    assert abs(out[9].q_contrib - (0 - 4) / 16) < 1e-6
    assert out[5].n_nodes == 2 and out[5].e_in == 0
    assert abs(out[5].q_contrib - (0 - 4) / 16) < 1e-6


def test_composes_with_lpa(spark):
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)],
        E_SCHEMA,
    )
    labels = label_propagation(edges, n_rounds=4)
    out = modularity(edges, labels).collect()
    assert sum(r.n_nodes for r in out) == 6
    # any partition's Q is bounded by [-0.5, 1)
    q = sum(r.q_contrib for r in out)
    assert -0.5 <= q < 1

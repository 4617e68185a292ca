"""Fixed-point PageRank over a weighted edge list — the iterative
graph primitive next to dedup's connected components (min-label
propagation answers "which nodes touch"; PageRank answers "which
nodes matter").  Driven here over the event-type transition graph; at
scale the same operator ranks conversation reply/reference graphs.

Pure-INTEGER power iteration: ranks live in micro-units (Σ ≈ 10⁶·|V|)
and every update is

    pr'(v) = floor(0.15·10⁶) + Σ_{(u,v)∈E} (85·pr(u)·w(u,v)) DIV (100·wout(u))

— integer multiply + integer floor-division only, NO doubles anywhere,
so K iterations are bit-identical in any engine and the DuckDB oracle
simply unrolls them as K CTEs.  Dangling mass (nodes with no
out-edges) vanishes — the standard simplification; totals are then a
checksum of danglingness, not exactly 10⁶·|V|.

Scale notes (100 TB graphs): each iteration is ONE equi-join of the
edge list against the rank table keyed src (edges pre-grouped with
their out-weight, so the join input is |E| rows) + one hash-agg keyed
dst + a left join back onto the node set for rank sources with no
in-edges.  K is fixed (no convergence test ⇒ no driver round-trip per
step beyond the K loop itself); for long chains compose with
localCheckpoint every few iterations exactly as connected_components
does.  Integer bound: 85·pr·w < 2⁶³ holds while pr·w < 10¹⁷ — at
micro-unit ranks (≤10⁶·|V|/danglingness) and count weights that is
w·|V| < 10¹¹; widen to decimal(38,0) beyond (documented seam).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DAMP_NUM, DAMP_DEN = 85, 100   # d = 0.85 as an exact rational
BASE_U = 150_000               # floor((1-d)·10⁶)
M_U = 1_000_000


def pagerank_fixedpoint(edges: DataFrame, n_iter: int = 3,
                        src_col: str = "src", dst_col: str = "dst",
                        w_col: str = "w") -> DataFrame:
    """(node, pr_u): integer micro-unit PageRank after exactly n_iter
    power iterations from the uniform start (10⁶ per node)."""
    e = edges.groupBy(src_col, dst_col).agg(
        F.sum(w_col).cast("long").alias("w")
    )
    wout = e.groupBy(src_col).agg(F.sum("w").alias("wout"))
    e = e.join(wout, src_col).select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst"),
        "w", "wout",
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    pr = nodes.select("node", F.lit(M_U).cast("long").alias("pr_u"))
    for _ in range(int(n_iter)):
        contrib = (
            e.join(pr, e["src"] == pr["node"])
            .select(
                F.col("dst").alias("node"),
                F.expr(
                    f"({DAMP_NUM} * pr_u * w) DIV ({DAMP_DEN} * wout)"
                ).alias("cu"),
            )
            .groupBy("node")
            .agg(F.sum("cu").alias("inflow"))
        )
        pr = nodes.join(contrib, "node", "left").select(
            "node",
            (
                F.lit(BASE_U).cast("long")
                + F.coalesce(F.col("inflow"), F.lit(0))
            ).alias("pr_u"),
        )
    return pr

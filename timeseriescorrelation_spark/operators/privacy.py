"""Privacy / governance operators: k-anonymity risk reporting over
quasi-identifier combinations.

A transcript corpus shipped to training must answer "how many rows are
re-identifiable through coarse attributes?" before release.  The
k-anonymity report is the standard first gate: group by the
quasi-identifier (QI) tuple, count group sizes, and report — for each
policy threshold k — how many QI groups (and rows) fall below it.

Everything is exact integer counting plus one double division for the
percentage, so the DuckDB oracle matches bit-for-bit after 6dp.

Scale notes (100 TB): ONE hash-agg keyed by the QI tuple (map-side
partial counts collapse the raw scan), then a tiny re-aggregation of
|distinct QI| rows per threshold — the thresholds EXPLODE on the
collapsed group table, never on raw rows.  No windows, no joins; the
report is a handful of rows regardless of input size.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def kanon_report(df: DataFrame, quasi: list[Column | str],
                 ks: list[int] = (2, 5, 10)) -> DataFrame:
    """(k, n_groups, n_groups_below, n_rows_below, pct_rows_below):
    per policy threshold k, the QI groups of size < k, the rows they
    contain (the at-risk population), and that population's share.

    ``quasi`` are the quasi-identifier columns/expressions — pass
    pre-bucketed expressions (e.g. n_chars//100) so the QI space is
    the COARSENED one a release would actually publish."""
    cols = [
        (F.col(q) if isinstance(q, str) else q).alias(f"_q{i}")
        for i, q in enumerate(quasi)
    ]
    groups = df.select(*cols).groupBy(
        *[f"_q{i}" for i in range(len(cols))]
    ).agg(F.count(F.lit(1)).alias("gn"))
    per_k = groups.select(
        "gn",
        F.explode(F.array(*[F.lit(int(k)) for k in ks])).alias("k"),
    )
    rep = per_k.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("gn") < F.col("k"), 1).otherwise(0))
        .alias("n_groups_below"),
        F.sum(F.when(F.col("gn") < F.col("k"), F.col("gn")).otherwise(0))
        .alias("n_rows_below"),
        F.sum("gn").alias("_total"),
    )
    return rep.select(
        "k", "n_groups", "n_groups_below", "n_rows_below",
        F.round(
            F.col("n_rows_below").cast("double")
            / F.col("_total").cast("double"), 6
        ).alias("pct_rows_below"),
    )


def l_diversity(df: DataFrame, quasi: list[Column | str],
                sensitive: Column | str,
                ls: list[int] = (2, 3, 5)) -> DataFrame:
    """(l, n_groups, n_groups_below, n_rows_below, pct_rows_below):
    distinct l-diversity — k-anonymity's companion gate.  A QI group
    can be large (k-anonymous) yet still leak: if every row in it
    shares ONE sensitive value, membership reveals the attribute.
    Per policy threshold l, report the QI groups whose sensitive
    column carries fewer than l distinct values, the rows they hold,
    and that population's share.

    Same shape discipline as kanon_report: ONE hash-agg keyed by the
    QI tuple (count + exact count-distinct of the sensitive value via
    a two-level agg), thresholds explode on the collapsed group
    table.  Exact integers + one double divide.
    """
    cols = [
        (F.col(q) if isinstance(q, str) else q).alias(f"_q{i}")
        for i, q in enumerate(quasi)
    ]
    s = (F.col(sensitive) if isinstance(sensitive, str)
         else sensitive).alias("_s")
    qnames = [f"_q{i}" for i in range(len(cols))]
    # exact distinct: collapse (QI, sensitive) first, then count —
    # two map-side-combinable hash-aggs, no expensive distinct agg
    per_val = df.select(*cols, s).groupBy(*qnames, "_s").agg(
        F.count(F.lit(1)).alias("vn")
    )
    groups = per_val.groupBy(*qnames).agg(
        F.sum("vn").alias("gn"),
        F.count(F.lit(1)).alias("gd"),
    )
    per_l = groups.select(
        "gn", "gd",
        F.explode(F.array(*[F.lit(int(v)) for v in ls])).alias("l"),
    )
    rep = per_l.groupBy("l").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("gd") < F.col("l"), 1).otherwise(0))
        .alias("n_groups_below"),
        F.sum(F.when(F.col("gd") < F.col("l"), F.col("gn")).otherwise(0))
        .alias("n_rows_below"),
        F.sum("gn").alias("n_rows"),
    )
    return rep.select(
        "l", "n_groups", "n_groups_below",
        F.col("n_rows_below").cast("long").alias("n_rows_below"),
        F.round(
            F.col("n_rows_below").cast("double")
            / F.col("n_rows").cast("double"), 6
        ).alias("pct_rows_below"),
    )

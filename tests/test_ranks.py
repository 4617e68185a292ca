"""Distributed global rank / ntile (operators.ranks) and the
gaps-and-islands interval union (operators.intervals.interval_islands).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.intervals import interval_islands
from timeseriescorrelation_spark.operators.ranks import (
    global_row_number,
    ntile_expr,
)


def test_global_row_number_matches_window(spark):
    """Two-pass distributed rank == single-partition row_number window
    on the same total order, including duplicate keys (tie-broken by
    the unique id column)."""
    df = spark.range(0, 997).select(
        F.col("id"),
        (F.col("id") % 13).alias("k"),
    )
    got, total = global_row_number(
        df, [F.asc("k"), F.asc("id")], out_col="rn"
    )
    assert total == 997
    want = df.withColumn(
        "rn", F.row_number().over(Window.orderBy(F.asc("k"), F.asc("id")))
    )
    assert got.select("id", "rn").exceptAll(
        want.select("id", "rn")
    ).count() == 0


def test_global_row_number_desc_order(spark):
    df = spark.range(0, 101)
    got, total = global_row_number(df, [F.desc("id")], out_col="rn")
    rows = {r["id"]: r["rn"] for r in got.collect()}
    assert total == 101
    assert rows[100] == 1 and rows[0] == 101


def test_ntile_expr_matches_sql_ntile(spark):
    """Exact integer ntile formula == Spark's window ntile for totals
    that exercise the remainder (first r buckets get one extra row),
    and the fewer-rows-than-buckets degenerate case."""
    for total, n in [(997, 5), (1000, 8), (3, 7), (10, 10), (11, 4)]:
        df = spark.range(1, total + 1).select(F.col("id").alias("rn"))
        got = df.select("rn", ntile_expr("rn", total, n).alias("t"))
        want = df.select(
            "rn", F.ntile(n).over(Window.orderBy("rn")).alias("t")
        )
        assert got.exceptAll(want).count() == 0, (total, n)


def test_interval_islands_containment(spark):
    """A long span fully containing later short ones must NOT split
    the island (the lag(end) form gets this wrong; the running-max
    form is correct), and touching spans merge under [s, e)."""
    rows = [
        # key g1: [0,100) contains [10,20) and [30,40); [100,110)
        # touches the end -> ONE island [0,110)
        ("g1", 0, 100), ("g1", 10, 20), ("g1", 30, 40), ("g1", 100, 110),
        # key g2: disjoint spans -> two islands, longest 50
        ("g2", 0, 10), ("g2", 60, 110),
    ]
    df = spark.createDataFrame(rows, ["k", "s_us", "e_us"])
    got = {
        r["k"]: r.asDict()
        for r in interval_islands(df, keys=["k"]).collect()
    }
    assert got["g1"]["n_islands"] == 1
    assert got["g1"]["n_spans"] == 4
    assert got["g1"]["covered_us"] == 110
    assert got["g1"]["longest_us"] == 110
    assert got["g2"]["n_islands"] == 2
    assert got["g2"]["covered_us"] == 60
    assert got["g2"]["longest_us"] == 50

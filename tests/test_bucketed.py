"""Bucketed co-located joins: writing both sides bucketBy(conv_id)
must make later conv_id equi-joins exchange-free, and the join result
must equal the plain-shuffle join exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from timeseriescorrelation_spark.sources.bucketed import (
    colocated_join,
    write_bucketed,
)


@pytest.fixture(scope="module")
def bucketed_tables(spark, tiny_series):
    agg = tiny_series.groupBy("conv_id").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("value"), 6).alias("sum_v"),
    )
    meta = tiny_series.groupBy("conv_id").agg(
        F.min("ts").alias("first_ts"), F.max("ts").alias("last_ts")
    )
    write_bucketed(agg, "b_agg", 4)
    write_bucketed(meta, "b_meta", 4)
    yield "b_agg", "b_meta"
    spark.sql("DROP TABLE IF EXISTS b_agg")
    spark.sql("DROP TABLE IF EXISTS b_meta")


def test_colocated_join_has_no_exchange(spark, bucketed_tables):
    # the test tables are tiny, so Catalyst would auto-broadcast and
    # skip bucketing entirely ("Bucketed: false (disabled by query
    # planner)"); at real scale neither side is broadcastable — force
    # the non-broadcast plan the bucketing exists for
    lt, rt = bucketed_tables
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = colocated_join(spark, lt, rt)
        plan = j._jdf.queryExecution().executedPlan().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "Bucketed: true" in plan, plan


def test_colocated_join_matches_shuffle_join(spark, bucketed_tables, tiny_series):
    lt, rt = bucketed_tables
    got = sorted(
        (r.conv_id, r.n_points, r.sum_v)
        for r in colocated_join(spark, lt, rt).collect()
    )
    agg = tiny_series.groupBy("conv_id").agg(
        F.count("*").alias("n_points"),
        F.round(F.sum("value"), 6).alias("sum_v"),
        F.min("ts").alias("first_ts"),
    )
    want = sorted(
        (r.conv_id, r.n_points, r.sum_v) for r in agg.collect()
    )
    assert got == want


def test_bucketed_aggregation_no_exchange(spark, bucketed_tables):
    """groupBy on the bucket key also rides the bucket spec: no
    exchange before the aggregation."""
    lt, _ = bucketed_tables
    df = spark.read.table(lt).groupBy("conv_id").agg(
        F.sum("n_points").alias("s")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan

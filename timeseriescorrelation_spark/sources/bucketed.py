"""Bucketed tables for co-located, exchange-free joins (SURVEY §2.3;
the task brief's "bucketing for co-located joins").

At 100 TB the dominant cost of any conv_id-keyed join (series ⋈ fill
grid, tier ⋈ manifest, transcripts ⋈ derived series) is the shuffle of
the fact side.  Hive-style bucketing amortizes that shuffle into the
WRITE: both sides are written `bucketBy(n, conv_id)` +
`sortBy(conv_id)`, and every later equi-join on conv_id (with matching
bucket counts) needs NO Exchange on either side — Spark's
FileSourceScanExec reports the bucket spec as its output partitioning
and the join planner accepts it (plan-asserted in
tests/test_bucketed.py: zero Exchange under the SortMergeJoin).

Scale guidance:
- bucket count: pick ≈ cluster cores × small factor at write time;
  bucket counts must MATCH (or divide evenly, with
  spark.sql.bucketing.coalesceBucketsInJoin.enabled) across tables
  meant to join.
- bucketing requires the session catalog (`saveAsTable`) — a bare
  parquet path cannot carry the bucket spec.  On the production
  stack the same role is played by Iceberg's bucket partition
  transform (`bucket(N, conv_id)`), wired through TableIO's catalog
  branch; this module is the catalog-warehouse equivalent that the
  sandbox can actually execute and plan-assert.
- writes also `sortBy` the key, so bucket files are sorted runs:
  joins skip the sort stage too when Spark can use the sorted spec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, n_buckets: int,
                   key: str = "conv_id", sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    """Write ``df`` as a bucketed+sorted managed table.

    One shuffle now (bucket assignment), zero shuffles for every
    future equi-join or aggregation on ``key`` against a
    same-bucket-count table."""
    sort_cols = sort_cols or [key]
    (
        df.write.mode(mode)
        .bucketBy(n_buckets, key)
        .sortBy(*sort_cols)
        .format("parquet")
        .saveAsTable(table)
    )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.read.table(table)


def colocated_join(spark: SparkSession, left_table: str, right_table: str,
                   key: str = "conv_id", how: str = "inner") -> DataFrame:
    """Join two same-bucket-count tables on their bucket key.

    The plan must contain no Exchange: each task reads bucket i of
    both tables and joins locally — the 100 TB shape for repeated
    fact-to-fact joins (the shuffle was paid once at write)."""
    return read_table(spark, left_table).join(
        read_table(spark, right_table), key, how
    )

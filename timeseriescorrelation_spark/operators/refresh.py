"""Materialized-tier refresh: fold a late-arriving delta into an
on-disk tier table, rewriting ONLY the partitions the delta touches.

This is the storage half of exact incremental maintenance
(`rollup.tier_merge` is the compute half): the tier lives as
day-partitioned parquet in upsertable form (standard tier columns +
fkey/lkey packed order keys), and a refresh is

    delta partials  →  touched-day pruned read of the stored tier
                    →  tier_merge  →  dynamic partition overwrite

so a late day of transcripts costs O(delta + touched partitions), not
O(history).  With `partitionOverwriteMode=dynamic` Spark replaces
exactly the partitions present in the written DataFrame — untouched
day directories are not rewritten (asserted by file-identity in
tests/test_refresh.py).  On Iceberg the same shape is
`MERGE INTO`/`overwritePartitions` with the manifest pruning the read;
day-partitioned parquet is the jar-free equivalent this sandbox can
execute, and the operator keeps that seam explicit.

The touched-day list is collected to the driver: it is PARTITION
VALUES (≤ a few thousand strings for years of days), the same
metadata any table format's planner materializes — not data rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.rollup import (
    rollup_raw_upsertable,
    tier_merge,
)

PART_COL = "day_pt"


def _with_part(tier_df: DataFrame) -> DataFrame:
    return tier_df.withColumn(
        PART_COL, F.date_format("bucket_ts", "yyyy-MM-dd")
    )


def write_tier(series: DataFrame, path: str, tier: str = "1h") -> None:
    """Initial materialization: upsertable tier partials, partitioned
    by day so later refreshes and retention sweeps prune on read."""
    _with_part(rollup_raw_upsertable(series, tier)).write.partitionBy(
        PART_COL
    ).mode("overwrite").parquet(path)


def refresh_tier(spark: SparkSession, path: str, delta: DataFrame,
                 tier: str = "1h") -> list[str]:
    """Fold `delta` (raw series rows) into the tier at `path`.

    Returns the list of day-partition values rewritten.  Exactness:
    read-back equals the direct rollup of (original ∪ delta) — the
    tier_merge invariant, asserted end-to-end in tests."""
    up = _with_part(rollup_raw_upsertable(delta, tier))
    days = [r[0] for r in up.select(PART_COL).distinct().collect()]
    if not days:
        return []
    existing = spark.read.parquet(path).where(F.col(PART_COL).isin(days))
    merged = tier_merge(existing.drop(PART_COL), up.drop(PART_COL))
    old_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static"
    )
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        _with_part(merged).write.partitionBy(PART_COL).mode(
            "overwrite"
        ).parquet(path)
    finally:
        spark.conf.set(
            "spark.sql.sources.partitionOverwriteMode", old_mode
        )
    return sorted(days)

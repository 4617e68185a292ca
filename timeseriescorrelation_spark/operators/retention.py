"""Retention policy over the tier cascade (the "retention" in
rollup + downsample + retention): each tier keeps a trailing window of
buckets relative to a reference `now`; older buckets are dropped from
that tier because the next-coarser tier still summarizes them (raw
expires first, 1m next, ..., the coarsest tier is usually unbounded).

Scale notes: retention is a pure bucket_ts predicate.  Tier tables are
written partitioned by time at scale, so the predicate prunes whole
partitions/directories at the scan (see
tests/test_plans.py::test_partition_pruning_on_partitioned_tier) —
applying retention costs a metadata listing, not a data read; an
Iceberg `DELETE WHERE bucket_ts < cutoff` on a day-partitioned table is
a metadata-only drop of whole partitions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_retention(tier_df: DataFrame, now_df: DataFrame,
                    keep_seconds: int | None,
                    ts_col: str = "bucket_ts") -> DataFrame:
    """Rows of one tier surviving the policy.  ``now_df`` is a 1-row
    (broadcast) frame with column `_now` — derived from the data (max
    event ts) or a literal; keeping it a frame makes the whole policy
    one lazy plan with no driver round-trip.  keep_seconds=None keeps
    everything."""
    if keep_seconds is None:
        return tier_df
    t = tier_df.join(F.broadcast(now_df))
    return t.where(
        F.col(ts_col)
        >= F.col("_now") - F.expr(f"interval {int(keep_seconds)} seconds")
    ).drop("_now")


def retention_report(tiers: dict[str, DataFrame], now_df: DataFrame,
                     policy: dict[str, int | None],
                     ts_col: str = "bucket_ts") -> DataFrame:
    """(tier, kept_rows, dropped_rows, oldest_kept) per policy entry —
    the dry-run accounting a retention job logs before deleting.
    Counts coalesce to 0 on an empty tier (sum over zero rows is NULL
    in SQL); an empty policy is a caller bug and raises."""
    if not policy:
        raise ValueError("retention policy is empty — nothing to report")
    parts = []
    for tier, keep_seconds in policy.items():
        t = tiers[tier].join(F.broadcast(now_df))
        if keep_seconds is None:
            kept = F.lit(True)
        else:
            kept = F.col(ts_col) >= F.col("_now") - F.expr(
                f"interval {int(keep_seconds)} seconds"
            )
        zero = F.lit(0).cast("long")
        parts.append(
            t.agg(
                F.lit(tier).alias("tier"),
                F.coalesce(F.sum(F.when(kept, 1).otherwise(0)), zero)
                .alias("kept_rows"),
                F.coalesce(F.sum(F.when(kept, 0).otherwise(1)), zero)
                .alias("dropped_rows"),
                F.min(F.when(kept, F.col(ts_col))).alias("oldest_kept"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out

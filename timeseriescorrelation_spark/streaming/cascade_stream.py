"""Continuous-aggregate maintenance: the streaming 1m tier cascades
into a MATERIALIZED 1h tier via foreachBatch MERGE — the fourth stage
of the production pipeline (bronze dedup → silver 1m → THIS → gold
analytics read the 1h tier, never raw turns).

Each micro-batch of finalized 1m buckets aggregates to upsertable 1h
partials and folds into the stored tier through
`refresh.refresh_partials` (touched-day pruned read → tier_merge →
dynamic partition overwrite), so maintaining the hour tier costs
O(batch + touched partitions) forever — the continuous-aggregate
contract at the storage layer, with the exactness carried by the
tier_merge invariant (merge(rollup(A), rollup(B)) == rollup(A ∪ B)).

First/last discipline: 1m rows arrive WITHOUT packed keys (the
streaming tier emits plain buckets), but within one hour the minute
buckets are totally ordered by bucket_ts and append mode emits each
finalized bucket exactly once — so the in-hour order key is the
bucket's µs offset packed with the hour-grain convention
(off << 31, turn component 0), comparable across micro-batches of the
same hour.

Resume: the foreachBatch checkpoint makes the fold idempotent at the
batch boundary — a replayed batch rewrites the same partitions to the
same contents (the merge is deterministic), and new silver files are
processed exactly once.  Asserted in tests/test_cascade_stream.py:
two incremental drains == one batch rollup of everything.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions.timeutil import epoch_us
from timeseriescorrelation_spark.operators.refresh import (
    refresh_partials,
)

TIER_SCHEMA = (
    "conv_id string, metric string, bucket_ts timestamp, cnt bigint, "
    "sum double, min double, max double, first double, last double"
)


def partials_1h_from_1m(tier_1m: DataFrame) -> DataFrame:
    """Plain 1m tier rows → upsertable 1h partials (tier columns +
    fkey/lkey).  The order key is the minute bucket's offset in its
    hour packed with the hour-grain convention (off µs << 31)."""
    hour = F.date_trunc("hour", "bucket_ts")
    off = (
        (epoch_us(F.col("bucket_ts")) - epoch_us(hour))
        * F.lit(1 << 31)
    ).cast("long")
    return (
        tier_1m.select(
            "conv_id", "metric", hour.alias("h"), off.alias("k"),
            "cnt", "sum", "min", "max", "first", "last",
        )
        .groupBy("conv_id", "metric", F.col("h").alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", "k").alias("first"),
            F.min("k").alias("fkey"),
            F.max_by("last", "k").alias("last"),
            F.max("k").alias("lkey"),
        )
    )


def stream_cascade_1h(spark: SparkSession, silver_dir: str,
                      gold_dir: str, ck_dir: str) -> None:
    """Drain all currently-available silver (1m tier) files into the
    materialized 1h tier at `gold_dir` (Trigger.AvailableNow, durable
    offsets under `ck_dir`)."""
    tier = spark.readStream.schema(TIER_SCHEMA).parquet(silver_dir)

    def _fold(batch: DataFrame, _batch_id: int) -> None:
        if batch.isEmpty():
            return
        refresh_partials(
            batch.sparkSession, gold_dir, partials_1h_from_1m(batch)
        )

    q = (
        tier.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

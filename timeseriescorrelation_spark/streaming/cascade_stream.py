"""Continuous-aggregate maintenance: the streaming 1m tier cascades
into a MATERIALIZED 1h tier via foreachBatch MERGE — the fourth stage
of the production pipeline (bronze dedup → silver 1m → THIS → gold
analytics read the 1h tier, never raw turns) — and, round 4, onward
into a 1d tier: stage 1 also appends its 1h partials to an
append-only inter-stage log, and a second independently-checkpointed
stream folds that log into the materialized 1d tier
(stream_cascade_1h_1d).

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

Resume: foreachBatch is at-least-once, and the tier merge is ADDITIVE
— so exactly-once is engineered, not assumed: the inter-stage partials
log is overwrite-by-batch-id (a replayed batch rewrites its own
``batch_id=<id>`` partition to the same deterministic contents), and
both gold folds consult the sink-side ``_batch_ledger`` in
refresh_partials, skipping batch ids already applied.  Asserted in
tests/test_cascade_stream.py: two incremental drains == one batch
rollup of everything, and a replayed fold with the same batch id is a
no-op.
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


PARTIALS_SCHEMA = TIER_SCHEMA + ", fkey bigint, lkey bigint"

# hour-grain packed keys carry (off-in-hour µs << 31 | idx31); the
# day grain packs (off-in-day µs << 26 | idx26) — rollup._OFF_BITS
_H_IDX_BITS = 31
_D_IDX_BITS = 26


def partials_1d_from_1h(p1h: DataFrame) -> DataFrame:
    """Upsertable 1h partials → upsertable 1d partials: re-key each
    hour partial's fkey/lkey to the DAY-grain packed convention
    (off-in-day µs << 26 | idx) and fold.  The re-keying is exact:
    day offset = hour's offset-in-day + (fkey >> 31), and the turn
    component min(idx31, 2²⁶−1) equals the batch path's direct
    min(turn_idx, 2²⁶−1) clamp — so a chained 1m→1h→1d fold emits
    the same tier VALUES as rollup_raw_upsertable(series, "1d")
    (asserted in tests/test_cascade_stream.py; the key columns carry
    turn component 0 when fed from the plain silver tier, which the
    1h stage already documents).  The
    chain map is monotone within an hour, so min/max distribute and
    merges stay associative across micro-batches."""
    day = F.date_trunc("day", "bucket_ts")
    hour_off = epoch_us(F.col("bucket_ts")) - epoch_us(day)
    mask31 = (1 << _H_IDX_BITS) - 1
    cap26 = (1 << _D_IDX_BITS) - 1

    def chain(key: str):
        in_hour_off = F.shiftright(F.col(key), _H_IDX_BITS)
        idx = F.least(
            F.col(key).bitwiseAND(F.lit(mask31)), F.lit(cap26)
        )
        return (
            (hour_off + in_hour_off) * F.lit(1 << _D_IDX_BITS) + idx
        ).cast("long")

    kf, kl = chain("fkey"), chain("lkey")
    return (
        p1h.groupBy("conv_id", "metric", day.alias("bucket_ts"))
        .agg(
            F.sum("cnt").alias("cnt"),
            F.sum("sum").alias("sum"),
            F.min("min").alias("min"),
            F.max("max").alias("max"),
            F.min_by("first", kf).alias("first"),
            F.min(kf).alias("fkey"),
            F.max_by("last", kl).alias("last"),
            F.max(kl).alias("lkey"),
        )
    )


def fold_1m_batch(batch: DataFrame, batch_id: int, gold_dir: str,
                  partials_dir: str | None) -> None:
    """One stage-1 micro-batch fold: 1m rows → 1h partials → gold tier
    merge, with the partials optionally logged to the inter-stage feed
    under a ``batch_id=<id>`` partition via dynamic partition
    overwrite.  Module-level (not a closure) so the replay test can
    invoke the exact production fold twice with the same batch id and
    assert the log stays duplicate-free — foreachBatch is
    at-least-once, and this overwrite-by-batch-id (plus the gold
    tier's refresh ledger) is the idempotency mechanism."""
    if batch.isEmpty():
        return
    p1h = partials_1h_from_1m(batch)
    if partials_dir is not None:
        p1h = p1h.localCheckpoint()  # compute once, feed both sinks
        sess = batch.sparkSession
        old_mode = sess.conf.get(
            "spark.sql.sources.partitionOverwriteMode", "static"
        )
        sess.conf.set(
            "spark.sql.sources.partitionOverwriteMode", "dynamic"
        )
        try:
            p1h.withColumn(
                "batch_id", F.lit(int(batch_id))
            ).write.partitionBy("batch_id").mode(
                "overwrite"
            ).parquet(partials_dir)
        finally:
            sess.conf.set(
                "spark.sql.sources.partitionOverwriteMode", old_mode
            )
    refresh_partials(
        batch.sparkSession, gold_dir, p1h, batch_id=int(batch_id)
    )


def stream_cascade_1h(spark: SparkSession, silver_dir: str,
                      gold_dir: str, ck_dir: str,
                      partials_dir: str | None = None) -> None:
    """Drain all currently-available silver (1m tier) files into the
    materialized 1h tier at `gold_dir` (Trigger.AvailableNow, durable
    offsets under `ck_dir`).

    If `partials_dir` is given, each micro-batch's 1h partials are
    ALSO written there (parquet log partitioned by batch_id, fkey/lkey
    kept) — the inter-stage feed of the 1h→1d cascade stage.  An
    append-only-semantics log is load-bearing: the materialized gold
    dir is partition-REWRITTEN on refold, and a file-source stream
    over it would re-emit whole rewritten partitions into the next
    stage, double counting them; the partials log instead carries each
    batch's delta exactly once.  foreachBatch is at-least-once, so a
    blind `mode("append")` would NOT deliver that contract: a driver
    crash between the append and the checkpoint commit replays the
    batch and duplicates its partials forever.  Each batch therefore
    writes its own `batch_id=<id>` partition with DYNAMIC partition
    overwrite — a replayed batch rewrites the same partition to the
    same deterministic contents, keeping the log idempotent at the
    batch boundary (same discipline refresh_partials applies to the
    gold tiers)."""
    tier = spark.readStream.schema(TIER_SCHEMA).parquet(silver_dir)

    q = (
        tier.writeStream.foreachBatch(
            lambda batch, bid: fold_1m_batch(
                batch, bid, gold_dir, partials_dir
            )
        )
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_cascade_1d(spark: SparkSession, partials_1h_dir: str,
                      gold_1d_dir: str, ck_dir: str) -> None:
    """Second cascade stage: drain the batch_id-partitioned 1h-partials
    log into the materialized 1d tier (own checkpoint, so the 1h and 1d
    stages resume independently).  The log's batch_id partition column
    is a stage-1 idempotency key only — dropped here before folding."""
    feed = spark.readStream.schema(
        PARTIALS_SCHEMA + ", batch_id long"
    ).parquet(partials_1h_dir).drop("batch_id")

    def _fold(batch: DataFrame, batch_id: int) -> None:
        if batch.isEmpty():
            return
        refresh_partials(
            batch.sparkSession, gold_1d_dir, partials_1d_from_1h(batch),
            batch_id=int(batch_id),
        )

    q = (
        feed.writeStream.foreachBatch(_fold)
        .option("checkpointLocation", ck_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def stream_cascade_1h_1d(spark: SparkSession, silver_dir: str,
                         gold_1h_dir: str, partials_1h_dir: str,
                         gold_1d_dir: str, ck_root: str) -> None:
    """Full 1m→1h→1d continuous-aggregate cascade, one drain: stage 1
    folds silver into the 1h tier and appends its partials to the
    inter-stage log; stage 2 folds that log into the 1d tier.  Each
    stage owns its checkpoint under `ck_root` (round-3 verdict task
    #4's per-stage checkpoints)."""
    stream_cascade_1h(
        spark, silver_dir, gold_1h_dir, f"{ck_root}/ck_1h",
        partials_dir=partials_1h_dir,
    )
    stream_cascade_1d(
        spark, partials_1h_dir, gold_1d_dir, f"{ck_root}/ck_1d"
    )

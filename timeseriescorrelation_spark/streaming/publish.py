"""Exactly-once streaming publication into the snapshot store:
``foreachBatch`` + idempotent snapshot commits keyed by the streaming
batch id.

Spark's parquet streaming sink is at-least-once across FAILED batches
(a batch that wrote files but crashed before the sink's own log commit
re-runs and can leave orphans readers see).  Publishing through the
snapshot store closes that hole the same way Delta/Iceberg sinks do:

1. ``foreachBatch`` hands us (batch_df, batch_id); the checkpoint
   guarantees batch_id is assigned deterministically to the same input
   across restarts.
2. Each commit manifest records its ``batch_id``.  Before writing, the
   publisher scans committed manifests; a batch_id already present is
   SKIPPED — the replayed batch becomes a no-op instead of a duplicate.
3. The commit itself is the snapshot store's atomic manifest rename:
   a crash mid-write leaves data files but no manifest, so readers
   never see the partial batch, and the replay commits it exactly
   once.

Scale notes: the id scan is O(|versions|) driver metadata per batch
(bounded by expire_snapshots retention); data-file IO is the batch
DF's own distributed write.  Readers get snapshot isolation for free —
a dashboard pinned to version N is unaffected by in-flight batches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from timeseriescorrelation_spark.sources.snapshots import (
    _fs,
    _manifest,
    _versions,
    snapshot_write,
)


def _committed_batch_ids(spark, table_path: str) -> set[int]:
    jvm, fs, _ = _fs(spark, table_path)
    out = set()
    for v in _versions(jvm, fs, table_path):
        b = _manifest(jvm, fs, table_path, v).get("batch_id")
        if b is not None:
            out.add(int(b))
    return out


def snapshot_publish_batch(batch_df: DataFrame, batch_id: int,
                           table_path: str) -> int | None:
    """Commit one streaming micro-batch as an append snapshot, skipping
    batch ids already committed (replay after failure/restart).
    Returns the new version, or None if skipped/empty."""
    spark = batch_df.sparkSession
    if int(batch_id) in _committed_batch_ids(spark, table_path):
        return None
    # batch_id rides inside the atomic manifest commit — a crash
    # before the rename leaves no manifest (replay re-commits), a
    # crash after leaves the id visible (replay skips): exactly once
    return snapshot_write(
        batch_df, table_path, "append",
        extra_meta={"batch_id": int(batch_id)},
    )


def publish_stream(result: DataFrame, table_path: str,
                   checkpoint_dir: str, mode: str = "append") -> None:
    """Drain the streaming query into the snapshot table with
    exactly-once batch commits (Trigger.AvailableNow)."""
    q = (
        result.writeStream.outputMode(mode)
        .foreachBatch(
            lambda df, bid: snapshot_publish_batch(df, bid, table_path)
        )
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

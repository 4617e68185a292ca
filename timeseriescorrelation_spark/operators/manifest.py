"""Checkpoint manifest: per-partition lineage + metrics, idempotent
resume mid-tier (SURVEY S5/J6, BASELINE.json:6 "every stage emits
per-partition lineage + metrics to a checkpoint manifest so runs resume
idempotently mid-retention-tier").

Design:

- ``part_key`` is a *stable logical partition*: pmod(xxhash64(conv_id),
  n_parts) — independent of Spark's physical partitioning, so resume
  survives cluster-size changes (N vs 4N executors).
- Stage outputs are written parquet ``partitionBy(part_key)`` with
  dynamic partition overwrite: re-running a part overwrites exactly its
  directory with identical bytes → crash between data-write and
  manifest-append is safe (the re-run converges, never duplicates).
- ``content_hash`` is an order-insensitive bit_xor of xxhash64 over all
  output columns — cheap, associative, shuffle-order independent.
- Resume = left_anti join of the input's part keys against the
  manifest's completed parts for (run_id, stage) (J6).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MANIFEST_TABLE = "manifest"


def with_part_key(df: DataFrame, key_col: str = "conv_id",
                  n_parts: int = 64) -> DataFrame:
    return df.withColumn(
        "part_key",
        F.pmod(F.xxhash64(F.col(key_col)), F.lit(n_parts)).cast("int"),
    )


def content_hash(df: DataFrame, group_cols: list[str]) -> DataFrame:
    data_cols = [c for c in df.columns if c not in group_cols]
    row_hash = F.xxhash64(*[F.col(c).cast("string") for c in data_cols])
    return df.groupBy(*group_cols).agg(
        F.count("*").alias("output_rows"),
        F.bit_xor(row_hash).alias("_h"),
    ).withColumn("content_hash", F.conv(F.col("_h").cast("string"), 10, 16)).drop("_h")


class ManifestStore:
    """Parquet/Iceberg-backed manifest of completed (run_id, stage,
    part_key) units."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.path = os.path.join(root, MANIFEST_TABLE)

    def _exists(self) -> bool:
        """Scheme-agnostic existence probe via the Hadoop FileSystem API
        — NOT os.path.exists, which is always False for s3://, hdfs://,
        abfs:// roots on a real cluster and would make resume silently
        never engage (every run recomputing and re-appending all
        parts).  No Spark job; one namenode/object-store HEAD."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(self.path)
        fs = hpath.getFileSystem(
            self.spark._jsc.hadoopConfiguration()  # type: ignore[union-attr]
        )
        return bool(fs.exists(hpath))

    def read(self) -> DataFrame:
        from timeseriescorrelation_spark.schemas import manifest_schema

        if not self._exists():
            return self.spark.createDataFrame([], manifest_schema())
        return self.spark.read.parquet(self.path)

    def done_parts(self, run_id: str, stage: str) -> DataFrame:
        return (
            self.read()
            .where((F.col("run_id") == run_id) & (F.col("stage") == stage))
            .select(F.col("part_key").cast("int").alias("part_key"))
            .distinct()
        )

    def append(self, rows: DataFrame) -> None:
        rows.write.mode("append").parquet(self.path)

    def delete_stage_parts(self, run_id: str, stage: str, keep_frac: float) -> None:
        """Test helper: keep only a fraction of a stage's manifest rows
        (simulates a mid-tier crash)."""
        df = self.read().cache()
        df.count()
        k = max(2, round(1.0 / max(keep_frac, 1e-9)))
        kept = df.where(
            ~((F.col("run_id") == run_id) & (F.col("stage") == stage))
            | (F.pmod(F.col("part_key").cast("long"), F.lit(k)) == 0)
        )
        kept_local = kept.collect()
        df.unpersist()
        from timeseriescorrelation_spark.schemas import manifest_schema

        self.spark.createDataFrame(kept_local, manifest_schema()).write.mode(
            "overwrite"
        ).parquet(self.path)


def run_stage(
    spark: SparkSession,
    root: str,
    run_id: str,
    stage: str,
    input_df: DataFrame,
    fn,
    key_col: str = "conv_id",
    n_parts: int = 64,
    extra_metrics: dict[str, str] | None = None,
) -> DataFrame:
    """Run ``fn(todo_df) -> DataFrame`` over the not-yet-done logical
    partitions, write output partitioned by part_key (dynamic
    overwrite), append manifest rows.  Returns the full stage output
    (done + new) read back from storage."""
    store = ManifestStore(spark, root)
    out_path = os.path.join(root, stage)

    inp = with_part_key(input_df, key_col, n_parts)
    done = store.done_parts(run_id, stage)
    todo = inp.join(done, "part_key", "left_anti")

    # One job computes the per-part input counts (<= n_parts rows) AND
    # answers "anything left to do?" — collected to the driver so the
    # manifest append later joins a tiny local DataFrame instead of
    # recomputing todo's whole lineage a second time.  (Previously a
    # separate todo.limit(1).count() job existed just for the emptiness
    # test — one extra scheduler round-trip per stage per run.)
    in_count_rows = (
        todo.groupBy("part_key")
        .agg(F.count("*").alias("input_rows"))
        .collect()
    )

    if in_count_rows:
        in_counts = spark.createDataFrame(
            in_count_rows, "part_key int, input_rows long"
        )
        out = fn(todo.drop("part_key"))
        out = with_part_key(out, key_col, n_parts)
        (
            out.repartition("part_key")
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("part_key")
            .parquet(out_path)
        )

        written = spark.read.parquet(out_path).join(
            in_counts.select("part_key"), "part_key", "left_semi"
        )
        mrows = (
            content_hash(written, ["part_key"])
            .join(in_counts, "part_key", "left")
            .select(
                F.lit(run_id).alias("run_id"),
                F.lit(stage).alias("stage"),
                F.col("part_key").cast("string").alias("part_key"),
                F.coalesce("input_rows", F.lit(0)).alias("input_rows"),
                "output_rows",
                "content_hash",
                F.create_map(
                    F.lit("points_out"), F.col("output_rows")
                ).alias("metrics"),
                F.current_timestamp().alias("completed_at"),
            )
        )
        store.append(mrows)

    return spark.read.parquet(out_path).drop("part_key")

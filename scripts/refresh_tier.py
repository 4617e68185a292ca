"""spark-submit job for incremental tier refresh: fold late-arriving
raw series rows into a materialized day-partitioned tier, rewriting
only the touched partitions (operators/refresh.py).

Local smoke:
    python scripts/refresh_tier.py --tier-path /tmp/tsc_tier1h \
        --delta /root/testdata/sf0.001 --tier 1h --init

Cluster:
    spark-submit --py-files /tmp/tsc_spark.zip scripts/refresh_tier.py \
        --tier-path s3://bucket/tsc/tier1h --delta ice.late_transcripts

``--init`` materializes the tier from the delta instead of refreshing
(first run).  ``--delta`` accepts a parquet dir (events.parquet inside,
sandbox layout) or a catalog-qualified table, resolved like
run_pipeline's --input.

NOT idempotent by itself: a refresh ADDS the delta's partials, so
replaying the same delta double-counts — exactly-once delivery of
deltas is the upstream layer's contract (the checkpoint manifest for
batch stages, `streaming.dedup_stream` for at-least-once transports).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load_series(spark, inp: str):
    import re

    from pyspark.sql import functions as F

    if re.fullmatch(r"[A-Za-z_]\w*(\.[A-Za-z_]\w*)+", inp):
        df = spark.read.table(inp)
    else:
        df = spark.read.parquet(os.path.join(inp, "events.parquet"))
    return df.select(
        F.col("user_id").cast("string").alias("conv_id"),
        F.col("event_type").alias("metric"),
        F.col("ts"),
        F.col("event_id").cast("int").alias("turn_idx"),
        F.col("value"),
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tier-path", required=True)
    ap.add_argument("--delta", required=True,
                    help="parquet dir or table of late raw rows")
    ap.add_argument("--tier", default="1h", choices=["1m", "1h", "1d"])
    ap.add_argument("--init", action="store_true",
                    help="first materialization instead of a refresh")
    args = ap.parse_args()

    from timeseriescorrelation_spark.operators.refresh import (
        refresh_tier,
        write_tier,
    )
    from timeseriescorrelation_spark.session import get_spark

    spark = get_spark(app_name="tsc-refresh")
    delta = _load_series(spark, args.delta)
    if args.init:
        write_tier(delta, args.tier_path, args.tier)
        print(f"initialized {args.tier} tier at {args.tier_path}",
              flush=True)
    else:
        days = refresh_tier(spark, args.tier_path, delta, args.tier)
        print(f"refreshed partitions: {days}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()

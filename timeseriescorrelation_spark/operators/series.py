"""Derive per-conversation metric series from transcripts (SURVEY.md §1.2 #2).

Metrics (BASELINE.json:6 — "per-conversation turn-rate, tool-call, and
token-length series"):

- ``token_len``  — whitespace token count of ``text`` per turn;
- ``tool_calls`` — 1.0 when ``tool`` is non-null, else 0.0;
- ``turn_rate``  — turns per minute = 60 / max(Δt, 1s) where Δt is the
  seconds since the previous turn of the same conversation (undefined
  for turn 0, which is dropped for this metric only).

One scan of transcripts; the three metrics are emitted by exploding an
array of structs (no triple-scan, no union shuffle).  The only shuffle
is the lag window's hash partition on conv_id, with an explicit
``sortWithinPartitions``-equivalent ordering by turn_idx inside the
window (stable-turn-ordering discipline, BASELINE.json:6 / SURVEY O1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def derive_series(transcripts: DataFrame) -> DataFrame:
    """transcripts → long series (conv_id, metric, ts, turn_idx, value)."""
    from timeseriescorrelation_spark.functions.timeutil import epoch_us

    # Pre-project token_len/tool_calls BELOW the window: expressions
    # evaluated in the same select as a window function land in the
    # Project ABOVE the Window's Exchange, which would shuffle the raw
    # multi-KB `text` column with every turn (measured ~7 GB of text
    # through the shuffle on a 3.7M-turn input).  A separate select
    # first lets Catalyst place the projection below the Exchange, so
    # only (conv_id, turn_idx, ts, two doubles) are shuffled.
    narrowed = transcripts.select(
        "conv_id",
        "turn_idx",
        "ts",
        F.size(F.split(F.col("text"), r"\s+")).cast("double").alias(
            "_token_len"
        ),
        F.when(F.col("tool").isNotNull(), F.lit(1.0))
        .otherwise(F.lit(0.0))
        .alias("_tool_calls"),
    )

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    prev_ts = F.lag("ts").over(w)
    delta_s = (epoch_us(F.col("ts")) - epoch_us(prev_ts)) / F.lit(1e6)
    turn_rate = F.when(prev_ts.isNull(), F.lit(None).cast("double")).otherwise(
        F.lit(60.0) / F.greatest(delta_s, F.lit(1.0))
    )

    # window expressions can't live inside a generator: project them to
    # plain columns first, then explode
    flat = narrowed.select(
        "conv_id",
        "turn_idx",
        "ts",
        "_token_len",
        "_tool_calls",
        turn_rate.alias("_turn_rate"),
    )
    mv = F.explode(
        F.array(
            F.struct(
                F.lit("token_len").alias("metric"),
                F.col("_token_len").alias("value"),
            ),
            F.struct(
                F.lit("tool_calls").alias("metric"),
                F.col("_tool_calls").alias("value"),
            ),
            F.struct(
                F.lit("turn_rate").alias("metric"),
                F.col("_turn_rate").alias("value"),
            ),
        )
    ).alias("mv")

    return (
        flat.withColumn("mv", mv)
        .select(
            "conv_id",
            F.col("mv.metric").alias("metric"),
            "ts",
            "turn_idx",
            F.col("mv.value").alias("value"),
        )
        .where(F.col("value").isNotNull())
    )

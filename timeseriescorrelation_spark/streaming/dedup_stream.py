"""Streaming ingest dedup: at-least-once transport → effectively-once
tables.

Replayed transcript turns (Kafka redelivery, file re-drops, upstream
retries) arrive as exact duplicates of (conv_id, turn_idx).  A batch
job removes them with `dropDuplicates`; continuously, that operator
would keep EVERY key ever seen in state — unbounded at 10^12 turns.
`dropDuplicatesWithinWatermark` is the bounded form: a duplicate is
only possible within the replay horizon (the watermark delay), so
state evicts keys older than the watermark and memory is
O(keys inside the horizon), not O(keys ever).

Semantics: the FIRST arrival of a key within the horizon is emitted,
later arrivals are dropped — even when their event timestamps differ
by less than the watermark delay (retries carry the original ts, so
this is exactly the replay case).  A true late *distinct* event under
the same key would also be dropped; keys must therefore identify the
logical turn, which (conv_id, turn_idx) does by construction.

Scale notes: state is a per-key hash map partitioned by the dedup key
(one shuffle); eviction is watermark-driven, so sizing is
horizon × arrival-rate, independent of table history.  The batch
equivalence (sink == batch dropDuplicates over the same input) is
asserted in tests/test_dedup_stream.py across micro-batch boundaries,
where the state — not intra-batch dedup — must catch the replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def stream_dedup(stream: DataFrame,
                 keys: list[str] = ("conv_id", "turn_idx")) -> DataFrame:
    """Watermarked stream → stream with replayed keys dropped.

    The input must already carry `withWatermark` (the watermark delay
    IS the dedup horizon — duplicates farther apart than it are not
    guaranteed dropped)."""
    return stream.dropDuplicatesWithinWatermark(list(keys))

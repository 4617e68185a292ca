"""Per-partition Gorilla chunk blobs (SURVEY.md §1.2 #4, BASELINE.json:6).

``encode_chunks`` groups raw series points by (conv_id, metric,
chunk_start=day) and encodes each group's (ts, value) arrays into one
binary blob with the vectorized codec in functions/gorilla.py.  The
group sort is done inside the Arrow batch (numpy argsort) — the shuffle
itself is the only cross-node data movement, and grouping whole chunks
per UDF call avoids partition-edge artifacts (SURVEY §7 hard parts).

``decode_chunks`` is the inverse (chunk rows → points) via mapInPandas,
so a downstream stage can stream-decode without regrouping.

Compression accounting (raw_bytes = 16·n for (int64 ts, float64 value))
feeds the manifest metrics.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriescorrelation_spark.functions.gorilla import (
    decode_chunk,
    encode_chunks_batch,
)

_ENC_SCHEMA = (
    "conv_id string, metric string, chunk_start timestamp, n int, "
    "blob binary, raw_bytes long, enc_bytes long"
)

_DEC_SCHEMA = "conv_id string, metric string, ts timestamp, value double"


def encode_chunks(series: DataFrame, chunk: str = "day") -> DataFrame:
    """series (conv_id, metric, ts, turn_idx, value) → chunk blobs.

    Physical shape (v3, round 5): hash-repartition on conv_id, then a
    JVM-side ``groupBy(conv, metric, chunk_start).agg(sort_array(
    collect_list(struct(ts, turn_idx, value))))``, then one
    mapInArrow over the AGGREGATED rows whose list offsets feed
    ``encode_chunks_batch`` as its ``starts`` array directly.

    Why this shape (the r4 scaling postmortem): the previous
    sort-and-stream form (repartition → sortWithinPartitions → stream
    every POINT row into Python) made the JVM serializer thread do a
    full per-partition sort AND re-serialize conv_id/metric strings
    once per point (~2 GB of repeated strings at the 44M-point bench)
    — ~2 busy threads per task, which oversubscribes a shared host at
    local[32] and was the one fused job under the 0.8 scaling gate.
    Grouping JVM-side sends each chunk's key strings ONCE and its
    points as contiguous Arrow list children (zero-copy into numpy),
    cutting the Python-boundary bytes ~3× and replacing the O(n log n)
    partition sort with a hash-agg + per-chunk sort_array.  Blobs are
    byte-identical (same per-chunk (ts, turn_idx) ordering, same
    codec; asserted by the fixture + hypothesis tests).

    The single-shuffle property survives: the agg's ClusteredDistribution
    on (conv, metric, chunk_start) is satisfied by the conv_id-only
    hash partitioning (partition keys ⊆ grouping keys), so when the
    series arrive from derive_series whose turn-rate Window already
    exchanged on conv_id with the same count, the whole
    transcripts→chunks job still runs with ONE exchange of narrow
    pre-explode turn rows (plan-asserted in tests/test_plans.py).

    Per-chunk applyInPandas would be simpler but pays ~10× per-group
    transfer overhead at sf0.1's tiny ~55-point day-chunks (measured
    round 2: 106 s → 14 s); production-density chunks of 10³–10⁵
    points amortize everything and run the codec at full vector
    speed."""

    def _enc(batches):
        # Arrow-native: the list column's offsets ARE the codec's
        # group delimiters; ts/value are the struct children viewed
        # int64/float64 zero-copy.  No per-point Python, no per-point
        # string materialization.
        import pyarrow as pa

        for rb in batches:
            if rb.num_rows == 0:
                continue
            tbl = pa.Table.from_batches([rb]).combine_chunks()
            lst = tbl.column("pts")
            lst = lst.chunk(0) if lst.num_chunks else pa.array(
                [], type=lst.type
            )
            off = np.asarray(lst.offsets, dtype=np.int64)
            starts = off - off[0]
            n = np.diff(starts)
            flat = lst.flatten()  # honors the list's logical window
            ts = flat.field("ts").to_numpy(
                zero_copy_only=False
            ).astype("datetime64[us]").view(np.int64)
            vals = flat.field("value").to_numpy(
                zero_copy_only=False
            ).astype(np.float64)
            blobs = encode_chunks_batch(ts, vals, starts)
            yield pa.RecordBatch.from_arrays(
                [
                    tbl.column("conv_id").combine_chunks(),
                    tbl.column("metric").combine_chunks(),
                    tbl.column("chunk_start").combine_chunks(),
                    pa.array(n.astype(np.int32), type=pa.int32()),
                    pa.array(blobs, type=pa.binary()),
                    pa.array(16 * n, type=pa.int64()),
                    pa.array(
                        np.fromiter((len(b) for b in blobs),
                                    dtype=np.int64, count=len(blobs)),
                        type=pa.int64(),
                    ),
                ],
                names=["conv_id", "metric", "chunk_start", "n", "blob",
                       "raw_bytes", "enc_bytes"],
            )

    keyed = series.withColumn("chunk_start", F.date_trunc(chunk, "ts"))
    # explicit partition count: a bare repartition(cols) is an AQE
    # REPARTITION_BY_COL whose output AQE coalesces toward its
    # advisory byte size — measured 32 → ~3 partitions here, leaving
    # 3 Python workers to encode 80k chunks (14.7 s); pinning the
    # count keeps every core's worker busy (2.1 s)
    from timeseriescorrelation_spark.session import (
        shuffle_partition_count,
    )

    n_part = shuffle_partition_count(series.sparkSession)
    part = keyed.repartition(n_part, "conv_id")
    g = part.groupBy("conv_id", "metric", "chunk_start").agg(
        F.sort_array(
            F.collect_list(F.struct("ts", "turn_idx", "value"))
        ).alias("pts")
    )
    return g.mapInArrow(_enc, _ENC_SCHEMA)


def decode_chunks(chunks: DataFrame) -> DataFrame:
    """chunk blobs → points (conv_id, metric, ts, value)."""

    def _dec(it):
        for pdf in it:
            frames = []
            for row in pdf.itertuples(index=False):
                ts_us, vals = decode_chunk(bytes(row.blob))
                frames.append(
                    pd.DataFrame(
                        {
                            "conv_id": row.conv_id,
                            "metric": row.metric,
                            "ts": ts_us.astype("datetime64[us]"),
                            "value": vals,
                        }
                    )
                )
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return chunks.mapInPandas(_dec, _DEC_SCHEMA)


def rechunk(chunks: DataFrame, to: str = "month") -> DataFrame:
    """Compaction: re-group chunk blobs at a coarser boundary (e.g.
    day -> month) by stream-decoding and re-encoding.  Many small blobs
    per (conv, metric) become one bigger blob — fewer rows/files, a
    longer XOR context for the codec, and point-lossless (asserted by
    the rechunk_roundtrip driver query whose oracle is the raw points).

    Scale shape: decode is mapInPandas (no shuffle); the only shuffle
    is the re-group on (conv_id, metric, coarser chunk_start) — the
    same volume a fresh encode at that granularity would pay.  turn_idx
    is gone after the first encode; decoded points re-sort by ts alone,
    which is stable because encode wrote them time-ordered."""
    pts = decode_chunks(chunks).withColumn("turn_idx", F.lit(0))
    return encode_chunks(pts, to)


def compression_stats(chunks: DataFrame) -> DataFrame:
    """Aggregate compression-ratio metrics per metric."""
    return (
        chunks.groupBy("metric")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum("n").alias("points"),
            F.sum("raw_bytes").alias("raw_bytes"),
            F.sum("enc_bytes").alias("enc_bytes"),
            F.round(F.sum("raw_bytes") / F.sum("enc_bytes"), 3).alias(
                "ratio"
            ),
        )
    )

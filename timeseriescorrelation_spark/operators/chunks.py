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

    NOT a per-chunk applyInPandas: a (conv, metric, day) grouping
    makes ~1 Arrow group per chunk, and tens of thousands of tiny
    groups pay ~10x in per-group transfer overhead (measured: 106 s →
    14 s at sf0.1's 80k chunks; the residue is the codec's fixed
    ~30-numpy-call cost per chunk, which sf0.1's unrealistically tiny
    ~55-point day-chunks cannot amortize — production-density chunks
    of 10³–10⁵ points run the same code at full vector speed).
    Instead hash-repartition on
    (conv_id, metric), sort within partitions by the full chunk+order
    key, and encode every chunk of the partition from one concatenated
    Arrow stream — same blobs, same single shuffle, no partition-edge
    artifacts (a series' chunks all land in its hash partition)."""

    def _enc(batches):
        # mapInArrow, not mapInPandas: at 44M rows/partition-set the
        # Arrow→pandas conversion materializes every conv_id/metric
        # string as a Python object and the hash groupby walks them
        # again — measured to dominate the whole job (codec ~1 Mpts/s
        # vs job ~36k pts/s/core).  Arrow-native, strings stay in
        # arrow buffers end-to-end: run boundaries on the SORTED
        # stream come from three vectorized slice-compares, group keys
        # from one take(), and ts/value view as int64/float64
        # zero-copy.
        import pyarrow as pa
        import pyarrow.compute as pc

        bl = list(batches)
        if not bl:
            return
        tbl = pa.Table.from_batches(bl).combine_chunks()
        nrows = tbl.num_rows
        if nrows == 0:
            return

        def col(name):
            c = tbl.column(name)
            return c.chunk(0) if c.num_chunks else pa.array(
                [], type=c.type
            )

        conv, met, cs = col("conv_id"), col("metric"), col("chunk_start")
        # rows arrive sorted by (conv, metric, chunk_start, ts,
        # turn_idx) ⇒ chunks are contiguous runs
        if nrows > 1:
            chg = pc.or_(
                pc.or_(
                    pc.not_equal(conv.slice(1), conv.slice(0, nrows - 1)),
                    pc.not_equal(met.slice(1), met.slice(0, nrows - 1)),
                ),
                pc.not_equal(cs.slice(1), cs.slice(0, nrows - 1)),
            )
            bnd = np.flatnonzero(
                chg.to_numpy(zero_copy_only=False)
            ) + 1
        else:
            bnd = np.empty(0, dtype=np.int64)
        starts = np.concatenate([[0], bnd, [nrows]])
        n = np.diff(starts)
        first_idx = pa.array(starts[:-1])

        ts = col("ts").to_numpy(zero_copy_only=False).astype(
            "datetime64[us]"
        ).view(np.int64)
        vals = col("value").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        blobs = encode_chunks_batch(ts, vals, starts)
        yield pa.RecordBatch.from_arrays(
            [
                pc.take(conv, first_idx),
                pc.take(met, first_idx),
                pc.take(cs, first_idx),
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
    # partition on conv_id ALONE (not conv_id+metric): co-location of
    # a (conv, metric) series only needs the conv, and when the series
    # arrive from derive_series the upstream turn-rate Window already
    # hash-partitioned on conv_id with the same count — Spark then
    # ELIDES this repartition entirely (verified: 2 exchanges → 1),
    # so the fused transcripts→chunks job shuffles only the NARROW
    # pre-explode turn rows (no metric strings, no 3× explosion)
    part = keyed.repartition(n_part, "conv_id") \
        .sortWithinPartitions(
            "conv_id", "metric", "chunk_start", "ts", "turn_idx"
        )
    return part.select(
        "conv_id", "metric", "chunk_start", "ts", "value"
    ).mapInArrow(_enc, _ENC_SCHEMA)


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

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
    encode_chunk,
)

_ENC_SCHEMA = (
    "conv_id string, metric string, chunk_start timestamp, n int, "
    "blob binary, raw_bytes long, enc_bytes long"
)

_DEC_SCHEMA = "conv_id string, metric string, ts timestamp, value double"


def encode_chunks(series: DataFrame, chunk: str = "day") -> DataFrame:
    """series (conv_id, metric, ts, turn_idx, value) → chunk blobs."""

    def _enc(pdf: pd.DataFrame) -> pd.DataFrame:
        order = np.lexsort((pdf["turn_idx"].to_numpy(), pdf["ts"].to_numpy()))
        ts = pdf["ts"].to_numpy()[order].astype("datetime64[us]").view(np.int64)
        vals = pdf["value"].to_numpy(dtype=np.float64)[order]
        blob = encode_chunk(ts, vals)
        return pd.DataFrame(
            {
                "conv_id": [pdf["conv_id"].iloc[0]],
                "metric": [pdf["metric"].iloc[0]],
                "chunk_start": [pdf["chunk_start"].iloc[0]],
                "n": [len(ts)],
                "blob": [blob],
                "raw_bytes": [16 * len(ts)],
                "enc_bytes": [len(blob)],
            }
        )

    keyed = series.withColumn("chunk_start", F.date_trunc(chunk, "ts"))
    return keyed.groupBy("conv_id", "metric", "chunk_start").applyInPandas(
        _enc, _ENC_SCHEMA
    )


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

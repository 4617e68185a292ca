"""Multimodal payload plumbing: the byte-based decode stub must agree
with the byte-based DuckDB oracle formulation even on NON-ASCII text
(where utf-8 bytes != characters), pinning the oracle-gate semantics
the ASCII driver fixture cannot distinguish."""

from __future__ import annotations

import duckdb

from timeseriescorrelation_spark.operators.multimodal import (
    attach_payload,
    decode_metadata,
    frame_sample,
)

DOCS = [
    (0, "plain ascii header and body"),
    (1, "héllo wörld — naïve café résumé"),      # 2-byte utf-8 seqs
    (2, "数据 管道 去重 质量"),                    # 3-byte seqs, bytes ≫ chars
    (3, "mixed ascii → 混合 → ascii tail padding to cross 64 bytes " * 3),
    (4, ""),                                      # empty payload
]

META_SQL = """
WITH h AS (
  SELECT doc_id, hex(encode(text)) AS hx,
         cast(octet_length(encode(text)) AS bigint) AS n_bytes
  FROM docs
)
SELECT doc_id, n_bytes,
       cast(coalesce(list_sum(list_transform(
         generate_series(1, cast(least(16, n_bytes) AS int)),
         i -> ('0x' || substr(hx, 2 * i - 1, 2))::INT)), 0)
         AS bigint) AS header_sum
FROM h
"""

FRAMES_SQL = """
SELECT doc_id, cast(off // 64 AS int) AS frame_idx,
       cast(coalesce(list_sum(list_transform(
         generate_series(cast(off + 1 AS int),
                         cast(least(off + 64, n_bytes) AS int)),
         i -> ('0x' || substr(hx, 2 * i - 1, 2))::INT)), 0)
         AS bigint) AS frame_sum
FROM (
  SELECT doc_id, hex(encode(text)) AS hx,
         octet_length(encode(text)) AS n_bytes,
         unnest(generate_series(0,
           greatest(octet_length(encode(text)) - 1, 0), 64)) AS off
  FROM docs
)
"""


def _oracle(sql):
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE docs(doc_id BIGINT, text VARCHAR)"
    )
    con.executemany("INSERT INTO docs VALUES (?, ?)", DOCS)
    return con.sql(sql).fetchall()


def test_decode_metadata_byte_parity_non_ascii(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.n_bytes, r.header_sum)
        for r in decode_metadata(attach_payload(df)).collect()
    )
    want = sorted(_oracle(META_SQL))
    assert got == want
    # sanity: the non-ascii docs really do have bytes != chars
    by_id = {d: t for d, t in DOCS}
    n_bytes = {r[0]: r[1] for r in want}
    assert n_bytes[2] > len(by_id[2])


def test_frame_sample_byte_parity_non_ascii(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(
        (r.doc_id, r.frame_idx, r.frame_sum)
        for r in frame_sample(attach_payload(df), every_n_bytes=64).collect()
    )
    want = sorted(_oracle(FRAMES_SQL))
    assert got == want


def test_audio_energy_hand_frames(spark):
    """Known PCM: byte pairs -> int16 samples, per-frame RMS exact,
    zero crossings counted within frames only."""
    import math

    from timeseriescorrelation_spark.operators.multimodal import (
        audio_energy,
    )

    # samples: [+1, -1, +1, -1] (LE int16), then frame 2 all zeros
    pcm = (b"\x01\x00\xff\xff\x01\x00\xff\xff"  # 4 samples frame 0
           + b"\x00\x00" * 4)                   # 4 samples frame 1
    df = spark.createDataFrame(
        [(1, bytearray(pcm))], "doc_id long, payload binary"
    )
    rows = {
        r.frame_idx: r
        for r in audio_energy(df, frame_len=4).collect()
    }
    assert rows[0].n_samples == 4
    assert rows[0].zcr == 3                       # +-+- flips 3 times
    assert rows[0].rms == math.floor(1.0 * 1e6) / 1e6
    assert rows[1].rms == 0.0 and rows[1].zcr == 0
    # odd trailing byte is dropped, partial frame keeps true length
    df2 = spark.createDataFrame(
        [(2, bytearray(b"\x02\x00\x02\x00\x02\x00" + b"\x07"))],
        "doc_id long, payload binary",
    )
    (r0,) = audio_energy(df2, frame_len=4).collect()
    assert r0.n_samples == 3 and r0.rms == 2.0 and r0.zcr == 0

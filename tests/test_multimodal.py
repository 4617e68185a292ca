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

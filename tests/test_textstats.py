"""Text analysis + multimodal plumbing tests against hand-computed and
pure-Python oracles."""

from __future__ import annotations

import pytest

from timeseriescorrelation_spark.operators.multimodal import (
    _decode_stub,
    attach_payload,
    decode_metadata,
    frame_sample,
)
from timeseriescorrelation_spark.operators.textstats import (
    doc_fingerprints,
    doc_fingerprints_vocab,
    langid_heuristic,
    text_stats,
)

DOCS = [
    (0, "the quick brown fox"),
    (1, "a a a the the of"),
    (2, "Zz9 k2!  mixed," ),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_text_stats_values(spark, docs):
    rows = {r.doc_id: r for r in text_stats(docs).collect()}
    r0 = rows[0]
    assert (r0.n_chars, r0.n_tokens, r0.n_uniq) == (19, 4, 4)
    assert r0.stop_cnt == 1                    # 'the'
    assert r0.avg_tok_len == round(16 / 4, 6)  # thequickbrownfox
    r1 = rows[1]
    assert r1.stop_cnt == 6 and r1.stop_ratio == 1.0
    r2 = rows[2]
    # BPE-ish pieces of "zz9 k2!  mixed,": zz,9,k,2,!,mixed,, -> 7
    assert r2.bpe_cnt == 7


def test_langid_deterministic(spark, docs):
    rows = {r.doc_id: r for r in langid_heuristic(docs).collect()}
    # doc1: letters=aaathetheof(11), vowels=aaaeeo(6) -> 0.545... -> 'fi'
    assert rows[1].pred_lang == "fi"
    assert rows[1].vowel_ratio == round(6 / 11, 6)
    for r in rows.values():
        assert r.pred_lang in {"fi", "es", "en", "fr", "de"}


def test_fingerprint_order_sensitive(spark):
    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "beta alpha gamma"),
         (2, "alpha beta gamma")],
        "doc_id long, text string",
    )
    for fn in (doc_fingerprints, doc_fingerprints_vocab):
        fps = {r.doc_id: r.fp for r in fn(docs).collect()}
        assert fps[0] == fps[2]
        assert fps[0] != fps[1], fn.__name__
        assert all(0 <= v < (1 << 31) for v in fps.values())


def test_multimodal_decode_stub_roundtrip(spark, docs):
    rows = {r.doc_id: r for r in
            decode_metadata(attach_payload(docs)).collect()}
    for did, text in DOCS:
        n, hs, w, h = _decode_stub(text.encode())
        r = rows[did]
        assert (r.n_bytes, r.header_sum, r.fake_width, r.fake_height) == (
            n, hs, w, h)


def test_multimodal_frame_sample(spark):
    text = "x" * 130  # 3 frames at 64 bytes: 64+64+2
    docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
    rows = sorted(
        frame_sample(attach_payload(docs), 64).collect(),
        key=lambda r: r.frame_idx,
    )
    assert [r.frame_idx for r in rows] == [0, 1, 2]
    x = ord("x")
    assert [r.frame_sum for r in rows] == [64 * x, 64 * x, 2 * x]


def test_vocab_growth_first_sightings(spark):
    from timeseriescorrelation_spark.operators.textstats import (
        vocab_growth,
    )

    docs = spark.createDataFrame(
        [(0, "a b"), (1, "b c"), (2, "c d"), (3, "d")],
        "doc_id long, text string",
    )
    out = sorted(vocab_growth(docs, batch_size=2).collect(),
                 key=lambda r: r.batch_id)
    assert [(r.batch_id, r.n_docs, r.batch_vocab, r.new_tokens,
             r.cum_vocab) for r in out] == [
        (0, 2, 3, 3, 3),   # {a,b,c} all new
        (1, 2, 2, 1, 4),   # {c,d}: only d new
    ]


def test_readability_hand_counts(spark):
    from timeseriescorrelation_spark.operators.textstats import (
        text_readability,
    )

    rows = [
        # 6 words, 2 sentences, 6 vowel groups:
        # flesch = 206.835 - 1.015*3 - 84.6*1 = 119.19  -> easy
        (0, "The cat sat. The dog ran!"),
        # polysyllabic mush: 2 words, 1 sentence (floor), 8 groups
        # flesch = 206.835 - 2.03 - 84.6*4 = -133.595 -> difficult
        (1, "unbelievable organization"),
        (2, ""),  # zero words -> dropped
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in text_readability(df).collect()}
    assert set(out) == {0, 1}
    r0 = out[0]
    assert (r0["n_words"], r0["n_sentences"], r0["n_syllables"]) == (6, 2, 6)
    assert r0["flesch"] == pytest.approx(119.19, abs=1e-6)
    assert r0["band"] == "easy"
    r1 = out[1]
    assert (r1["n_words"], r1["n_sentences"]) == (2, 1)
    assert r1["band"] == "difficult"
    assert r1["flesch"] < 0

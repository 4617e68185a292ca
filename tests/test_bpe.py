"""BPE merge learning against the classic Sennrich worked example —
the merge sequence (with counts and lexicographic tie-breaks) is fully
hand-computable on this corpus."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.bpe import (
    EOW,
    bpe_learn,
    bpe_segment,
)


def _docs(spark):
    words = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return spark.createDataFrame(
        [(0, " ".join(words), "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )


def test_merge_sequence_matches_hand_computation(spark):
    merges = bpe_learn(_docs(spark), n_merges=6)
    assert merges == [
        ("e", "s", 9),        # newest(6) + widest(3)
        ("es", "t", 9),
        ("est", EOW, 9),
        ("l", "o", 7),        # ties (l,o)/(o,w) at 7 -> lexicographic
        ("lo", "w", 7),
        ("e", "w", 6),        # ties (e,w)/(n,e)/(w,est EOW) at 6
    ]


def test_segmentation_under_learned_merges(spark):
    docs = _docs(spark)
    merges = bpe_learn(docs, n_merges=6)
    pieces = {
        r.word: (r.n, r.pieces)
        for r in bpe_segment(docs, merges).collect()
    }
    assert pieces["newest"] == (6, ["n", "ew", "est" + EOW])
    assert pieces["low"] == (5, ["low", EOW])
    assert pieces["lower"] == (2, ["low", "e", "r", EOW])
    assert pieces["widest"] == (3, ["w", "i", "d", "est" + EOW])


def test_stops_when_no_pair_repeats(spark):
    docs = spark.createDataFrame(
        [(0, "ab cd ef", "en", "s", 1)],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    # every adjacent pair occurs once -> learning halts immediately
    assert bpe_learn(docs, n_merges=5) == []

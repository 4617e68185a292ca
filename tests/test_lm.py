"""Unigram-LM surprisal + source KL drift: hand-computed oracles."""

from __future__ import annotations

import math


def test_doc_surprisal_hand_computed(spark):
    from timeseriescorrelation_spark.operators.lm import doc_surprisal

    # corpus: a a a b  -> p(a)=3/4, p(b)=1/4
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in doc_surprisal(docs).collect()}
    su_a = round(math.log(4 / 3) * 1e6)
    su_b = round(math.log(4 / 1) * 1e6)
    assert got[1].n_toks == 3
    assert got[1].surprisal_u == math.floor(3 * su_a / 3)
    assert got[2].n_toks == 1 and got[2].surprisal_u == su_b
    # rarer-token doc is more surprising
    assert got[2].surprisal_u > got[1].surprisal_u


def test_source_drift_hand_computed(spark):
    from timeseriescorrelation_spark.operators.lm import source_drift

    # source X: a a b a   source Y: b b c b
    docs = spark.createDataFrame(
        [(1, "a a b a", "X"), (2, "b b c b", "Y")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in source_drift(docs).collect()}
    n = 8

    def kl(counts, ns):
        s = 0
        for tok, cs in counts.items():
            c = {"a": 3, "b": 4, "c": 1}[tok]
            s += round(cs * math.log((cs * n) / (c * ns)) * 1e6)
        return math.floor(s / ns)

    assert got["X"].n_toks == 4
    assert got["X"].kl_u == kl({"a": 3, "b": 1}, 4)
    assert got["Y"].kl_u == kl({"b": 3, "c": 1}, 4)
    assert got["X"].kl_u > 0 and got["Y"].kl_u > 0


def test_identical_sources_have_near_zero_drift(spark):
    from timeseriescorrelation_spark.operators.lm import source_drift

    docs = spark.createDataFrame(
        [(1, "x y z", "A"), (2, "x y z", "B")],
        "doc_id long, text string, source string",
    )
    for r in source_drift(docs).collect():
        assert abs(r.kl_u) <= 1  # fixed-point floor can give -1, not less


def test_collocations_pmi_hand_computed(spark):
    import math

    from timeseriescorrelation_spark.operators.lm import collocations_pmi

    # x,y are rare AND always adjacent -> high PMI; p,q are commoner
    # for the same pair count -> lower PMI
    docs = spark.createDataFrame(
        [(1, "x y x y q"), (2, "p q p"), (3, "q p r")],
        "doc_id long, text string",
    )
    out = {(r.tok_a, r.tok_b): r for r in
           collocations_pmi(docs, min_pair_n=2).collect()}
    # unordered bigrams: (x,y)x3, (q,y), (p,q)x3, (p,r) -> n_pair=8
    # unigrams: x2 y2 q3 p3 r1 -> n_tok=11
    assert set(out) == {("x", "y"), ("p", "q")}
    xy = out[("x", "y")]
    assert xy.pair_n == 3
    assert xy.pmi_u == round(math.log((3 * 11 * 11) / (8 * 2 * 2)) * 1e6)
    pq = out[("p", "q")]
    assert pq.pair_n == 3
    assert pq.pmi_u == round(math.log((3 * 11 * 11) / (8 * 3 * 3)) * 1e6)
    assert xy.pmi_u > pq.pmi_u


def test_phrase_search_order_and_adjacency(spark):
    from timeseriescorrelation_spark.operators.lm import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "a b c d a b c"),   # 2 hits of "a b c"
            (2, "c b a"),           # reversed -> no hit
            (3, "a x b c"),         # gap -> no hit
            (4, "b c a b"),         # no "a b c" window
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.n_hits for r in
           phrase_search(docs, ["a", "b", "c"]).collect()}
    assert got == {1: 2}


def test_dsir_ranks_target_like_docs_higher(spark):
    """Raw docs written in the target's vocabulary must score a higher
    importance weight than raw docs from a disjoint vocabulary, in
    BOTH bucket modes; n_bigrams is exact; sub-2-token docs drop."""
    from timeseriescorrelation_spark.operators.lm import dsir_weights

    target = [
        (i, "alpha beta gamma delta alpha beta", "tgt") for i in range(8)
    ]
    like = [(100, "alpha beta gamma alpha", "raw")]
    unlike = [(200, "zig zag zip zag zig zag", "raw")]
    tiny = [(300, "alpha", "raw")]
    df = spark.createDataFrame(
        target + like + unlike + tiny,
        "doc_id long, text string, source string")
    for mode in ("vocab", "xxhash64"):
        out = {r.doc_id: r for r in dsir_weights(
            df, target_source="tgt", n_buckets=64, mode=mode,
        ).collect()}
        assert set(out) == {100, 200}          # tiny doc dropped
        assert out[100].n_bigrams == 3
        assert out[200].n_bigrams == 5
        # per-bigram mean ratio: target-like positive-ish, disjoint negative
        assert out[100].logw_u / out[100].n_bigrams \
            > out[200].logw_u / out[200].n_bigrams
        assert out[200].logw_u < 0


def test_coverage_greedy_hand_computed_and_string_ids(spark):
    """Greedy max-coverage: doc with most distinct tokens first, then
    the doc adding most NEW tokens (not the next-biggest doc); string
    doc ids survive (r4 advice: int(did) crashed non-integer ids)."""
    from timeseriescorrelation_spark.operators.lm import coverage_greedy

    rows = [
        ("a", "w1 w2 w3 w4"),          # 4 distinct
        ("b", "w1 w2 w3"),             # 3 distinct, all inside a
        ("c", "w5 w6"),                # 2 distinct, all NEW after a
        ("d", "w4 w5"),                # 2 distinct, covered after a,c
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    out = coverage_greedy(df, k=4).collect()
    got = [(r["round"], r["doc_id"], r["gain"], r["covered_total"])
           for r in out]
    # round 3 would gain 0 (everything covered) -> early stop at 2
    assert got == [(1, "a", 4, 4), (2, "c", 2, 6)]
    assert out[0].__fields__ == ["round", "doc_id", "gain",
                                 "covered_total"]

    # bigram units: "x y" appears in both docs, so doc e (3 bigrams)
    # wins round 1 and f adds only its uncovered bigram
    df2 = spark.createDataFrame(
        [(1, "x y z x"), (2, "x y q")],
        "doc_id long, text string",
    )
    out2 = [(r["round"], r["doc_id"], r["gain"], r["covered_total"])
            for r in coverage_greedy(df2, k=3, ngram=2).collect()]
    # e=doc1 bigrams {x y, y z, z x}; doc2 {x y, y q}
    assert out2 == [(1, 1, 3, 3), (2, 2, 1, 4)]

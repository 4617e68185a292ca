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

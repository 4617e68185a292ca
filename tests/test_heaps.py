"""Heaps'-law fit (operators/textstats.heaps_fit): matches a numpy
log-log OLS on the same growth points; a corpus where every doc brings
all-new trigrams fits β ≈ 1 with r² ≈ 1; a saturated corpus (every
batch identical vocabulary) is degenerate and returns no row."""

from __future__ import annotations

import numpy as np

from timeseriescorrelation_spark.operators.textstats import heaps_fit

DOC_SCHEMA = "doc_id long, text string"


def test_fresh_vocab_beta_one(spark):
    # doc i contributes entirely fresh trigrams -> V ∝ N -> β = 1
    docs = [
        (i, " ".join(f"w{i}_{j}" for j in range(12)))
        for i in range(200)
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    r = heaps_fit(df, batch_size=50).collect()[0]
    assert r.n_batches == 4
    assert abs(r.beta - 1.0) < 1e-3
    assert r.r2 > 0.9999


def test_matches_numpy(spark):
    rng = np.random.default_rng(31)
    vocab = [f"t{k}" for k in range(40)]
    docs = [
        (i, " ".join(rng.choice(vocab, 30)))
        for i in range(300)
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    r = heaps_fit(df, batch_size=50).collect()[0]
    # rebuild the growth points in python
    seen, pts = set(), []
    cum_docs = 0
    for b in range(6):
        for i in range(b * 50, (b + 1) * 50):
            toks = docs[i][1].lower().split()
            for j in range(len(toks) - 2):
                seen.add(" ".join(toks[j:j + 3]))
        cum_docs += 50
        pts.append((cum_docs, len(seen)))
    x = np.round(np.log([p[0] for p in pts]) * 1e6)
    y = np.round(np.log([p[1] for p in pts]) * 1e6)
    k = len(x)
    beta = (k * (x * y).sum() - x.sum() * y.sum()) / (
        k * (x * x).sum() - x.sum() ** 2
    )
    assert abs(r.beta - beta) < 1e-5
    assert 0 < r.beta < 1


def test_saturated_corpus_degenerate(spark):
    docs = [(i, "a b c d e f") for i in range(200)]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    assert heaps_fit(df, batch_size=50).collect() == []

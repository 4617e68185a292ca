"""In-engine IRLS logistic fit: python replica of the two snapped
Newton steps + separability sanity."""

from __future__ import annotations

import math

from timeseriescorrelation_spark.operators.logit import logit_fit


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string,"
                                       " lang string")


def _feats(rows):
    out = []
    for _id, text, lang in rows:
        lt = text.lower()
        letters = sum(1 for ch in lt if "a" <= ch <= "z")
        vowels = sum(1 for ch in lt if ch in "aeiou")
        vr_u = round(vowels / letters * 1e6) if letters else 0
        out.append((1 if lang == "en" else 0,
                    len(text) / 1000.0, vr_u / 1e6))
    return out


def _replica(rows, n_iter=2):
    feats = _feats(rows)
    b = [0.0, 0.0, 0.0]
    for _ in range(n_iter):
        s = {k: 0 for k in ("g0", "g1", "g2", "h00", "h01", "h02",
                            "h11", "h12", "h22")}
        for y, x1, x2 in feats:
            z = b[0] + b[1] * x1 + b[2] * x2
            # μ is snapped to the shared 1e-9 grid before any product
            # (operators/logit.py round-3 single-surface recipe)
            mu = round(1.0 / (1.0 + math.exp(-z)) * 1e9) / 1e9
            w = mu * (1.0 - mu)
            r = y - mu
            s["g0"] += round(r * 1e9)
            s["g1"] += round(r * x1 * 1e9)
            s["g2"] += round(r * x2 * 1e9)
            s["h00"] += round(w * 1e9)
            s["h01"] += round(w * x1 * 1e9)
            s["h02"] += round(w * x2 * 1e9)
            s["h11"] += round(w * x1 * x1 * 1e9)
            s["h12"] += round(w * x1 * x2 * 1e9)
            s["h22"] += round(w * x2 * x2 * 1e9)
        g0, g1, g2 = (float(s[k]) for k in ("g0", "g1", "g2"))
        h00, h01, h02, h11, h12, h22 = (
            float(s[k]) for k in ("h00", "h01", "h02", "h11", "h12",
                                  "h22")
        )
        det = (h00 * (h11 * h22 - h12 * h12)
               - h01 * (h01 * h22 - h12 * h02)
               + h02 * (h01 * h12 - h11 * h02))
        d0 = (g0 * (h11 * h22 - h12 * h12)
              - h01 * (g1 * h22 - h12 * g2)
              + h02 * (g1 * h12 - h11 * g2))
        d1 = (h00 * (g1 * h22 - g2 * h12)
              - g0 * (h01 * h22 - h12 * h02)
              + h02 * (h01 * g2 - g1 * h02))
        d2 = (h00 * (h11 * g2 - h12 * g1)
              - h01 * (h01 * g2 - g1 * h02)
              + g0 * (h01 * h12 - h11 * h02))
        b = [b[0] + d0 / det, b[1] + d1 / det, b[2] + d2 / det]
    return b


def _corpus():
    rows = []
    # english-ish docs: vowel-heavy; others: consonant-heavy; length
    # varies independently
    for i in range(30):
        rows.append((i, ("see a bee in a tree " * (3 + i % 5)).strip(),
                     "en"))
    for i in range(30):
        rows.append((100 + i,
                     ("strch krz blt zmrt grsk " * (3 + i % 4)).strip(),
                     "de"))
    return rows


def test_logit_matches_python_replica(spark):
    rows = _corpus()
    got = logit_fit(_docs(spark, rows)).collect()[0]
    want = _replica(rows)
    assert got["n_docs"] == 60 and got["n_pos"] == 30
    for k, w in zip(("b0", "b1", "b2"), want):
        assert abs(got[k] - round(w, 6)) < 1e-9, (k, got[k], w)


def test_logit_separates_separable_corpus(spark):
    got = logit_fit(_docs(spark, _corpus())).collect()[0]
    # vowel ratio separates the classes cleanly -> near-perfect
    # training accuracy and a strongly positive vowel coefficient
    assert got["train_acc"] >= 0.95
    assert got["b2"] > 0

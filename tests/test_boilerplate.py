"""Boilerplate n-gram detector (operators/textstats.boilerplate_ngrams):
a 3-gram shared by ≥ min_df docs flags every instance, within-doc
repeats count per instance, unique docs score zero, short docs drop."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.textstats import (
    boilerplate_ngrams,
)

DOC_SCHEMA = "doc_id long, text string"

TPL = "all rights reserved contact us today"  # 4 shingles when 6 toks


def test_shared_template_flagged(spark):
    docs = [
        (1, TPL + " alpha beta gamma"),
        (2, TPL + " delta epsilon zeta"),
        (3, TPL + " eta theta iota"),
        (4, "entirely unique words nothing shared here at all"),
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    out = {r.doc_id: r for r in boilerplate_ngrams(df, min_df=3).collect()}
    # TPL = 6 tokens -> shingles 1-4 of each 9-token doc are template
    # (shingle 4 spans into the suffix only at position 5; positions
    # 1..4 are pure-template trigrams 'all rights reserved',
    # 'rights reserved contact', 'reserved contact us',
    # 'contact us today').
    for d in (1, 2, 3):
        assert out[d].n_shingles == 7
        assert out[d].n_boiler == 4
        assert abs(out[d].boiler_ratio - 4 / 7) < 1e-6
    assert out[4].n_boiler == 0 and out[4].boiler_ratio == 0.0


def test_within_doc_repeats_count_per_instance(spark):
    docs = [
        (1, TPL),
        (2, TPL),
        (3, TPL + " " + TPL),  # template pasted twice
    ]
    df = spark.createDataFrame(docs, DOC_SCHEMA)
    out = {r.doc_id: r for r in boilerplate_ngrams(df, min_df=3).collect()}
    assert out[1].n_shingles == 4 and out[1].n_boiler == 4
    # doc 3: 12 tokens -> 10 shingles; the 2 bridge shingles crossing
    # the paste seam exist only in doc 3 (df=1), the other 8 are
    # template instances.
    assert out[3].n_shingles == 10
    assert out[3].n_boiler == 8


def test_short_docs_drop(spark):
    df = spark.createDataFrame([(1, "only two"), (2, TPL)], DOC_SCHEMA)
    out = boilerplate_ngrams(df, min_df=2).collect()
    assert {r.doc_id for r in out} == {2}

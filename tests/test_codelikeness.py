"""Code-likeness triage (operators/textstats.code_likeness): a code
snippet scores above threshold, plain prose below; counts are exact;
the flag flips by integer cross-multiplication exactly on-threshold."""

from __future__ import annotations

from timeseriescorrelation_spark.operators.textstats import code_likeness

DOC_SCHEMA = "doc_id long, text string"

CODE = (
    "def f(x):\n    y = x * 2;\n    if y > 3:\n"
    "        return {1: (y, x)};\n    return None\n"
)
PROSE = (
    "The quick brown fox jumps over the lazy dog. It was a bright "
    "cold day in April and the clocks were striking thirteen."
)


def test_code_vs_prose(spark):
    df = spark.createDataFrame([(1, CODE), (2, PROSE)], DOC_SCHEMA)
    out = {r.doc_id: r for r in code_likeness(df).collect()}
    assert out[1].is_code and not out[2].is_code
    assert out[1].code_score > out[2].code_score
    assert out[2].n_symbols == 0 and out[2].n_indents == 0


def test_counts_are_exact(spark):
    df = spark.createDataFrame([(1, "a;;b{c}=\n\tx\n    y")], DOC_SCHEMA)
    r = code_likeness(df).collect()[0]
    # 2 semicolons*3 + braces(2)*3 + 1 equals*2 + 0 parens = 14
    assert r.n_symbols == 2 * 3 + 2 * 3 + 1 * 2
    assert r.n_indents == 2  # one tab-indent + one 4-space-indent
    assert r.n_lines == 3


def test_on_threshold_flag_integer_decided(spark):
    # craft text where 1000*num == 15*(n+1) exactly: num=3, n_chars=199
    txt = ";" + "a" * 198  # num = 3*1 = 3; 1000*3 = 3000; 15*200 = 3000
    df = spark.createDataFrame([(1, txt)], DOC_SCHEMA)
    r = code_likeness(df).collect()[0]
    assert r.n_chars == 199
    assert r.is_code is False  # strict >, equality stays prose

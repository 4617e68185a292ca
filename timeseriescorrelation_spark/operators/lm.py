"""Unigram language-model statistics for training-data curation:

- doc_surprisal: per-document mean token surprisal −ln p(tok) under
  the corpus unigram model — the cheap LM-quality screen (gibberish
  and boilerplate sit at the two tails; natural text in the middle).
  The standard curation recipe before a real-LM perplexity pass.
- source_drift: KL(source ‖ corpus) over token distributions per
  source — distribution-shift monitoring between ingest feeds
  ("did feed X start sending something else?").

Fixed-point cross-engine determinism (same trick as bm25.bm25_topk):
every ln() result is snapped to integer micro-units *before* any sum,
so aggregation is exact integer arithmetic and float addition order
can never change a result; DuckDB matches bit-for-bit.  All
probabilities enter ln() as a single division of two exact integers.

Scale notes (100 TB): token counts collapse in map-side partial aggs
(shuffle ~ |vocab| for the model, ~ |doc×distinct-tok| for scoring);
the vocab model joins the token stream keyed by token — at real vocab
sizes that's a shuffle join keyed on a zipfian column, so the hot
1000 tokens ride the SAME broadcast-threshold logic AQE applies, and
the corpus-total row is a 1-row broadcast.  No windows, no driver
round-trips.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.dedup import tokenize

M = 1_000_000.0


def _tokens(docs: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return (
        tokenize(docs, text_col, id_col)
        .select("doc_id", F.explode("toks").alias("tok"))
    )


def doc_surprisal(docs: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """(doc_id, n_toks, surprisal_u): mean −ln p(tok) per doc in
    integer micro-nats; p(tok) = corpus_count(tok)/corpus_total, so
    every token's surprisal is ln of one exact-integer ratio.  The
    per-doc mean divides the exact integer sum by the exact token
    count — one IEEE division, bit-equal cross-engine — then floors
    back to integer micro-nats (floor, not round: ties impossible)."""
    t = _tokens(docs, text_col, id_col)
    vocab = t.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    tot = vocab.agg(F.sum("c").alias("n_total"))
    per_tok = (
        t.join(vocab, "tok")
        .crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            F.round(
                F.log(
                    F.col("n_total").cast("double")
                    / F.col("c").cast("double")
                )
                * F.lit(M)
            ).cast("long").alias("su"),
        )
    )
    g = per_tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_toks"),
        F.sum("su").alias("ssum"),
    )
    return g.select(
        "doc_id",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.floor(
            F.col("ssum").cast("double") / F.col("n_toks").cast("double")
        ).cast("long").alias("surprisal_u"),
    )


def source_drift(docs: DataFrame, text_col: str = "text",
                 source_col: str = "source",
                 id_col: str = "doc_id") -> DataFrame:
    """(source, n_toks, kl_u): KL(source ‖ corpus) in integer
    micro-nats — Σ_tok p_s(tok)·ln(p_s(tok)/p(tok)), computed as the
    exact-integer-weighted sum of per-token micro-nat logs divided by
    the source's exact token total.

    ln(p_s/p) = ln((c_s·N)/(c·N_s)) — one division of two exact
    integer PRODUCTS, so both engines feed ln() the same double.
    Zero-count corpus tokens can't occur (source ⊆ corpus), so KL is
    always finite."""
    t = _tokens(docs, text_col, id_col).join(
        docs.select(F.col(id_col).alias("doc_id"),
                    F.col(source_col).alias("source")),
        "doc_id",
    )
    per_src = t.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("cs")
    )
    vocab = per_src.groupBy("tok").agg(F.sum("cs").alias("c"))
    src_tot = per_src.groupBy("source").agg(F.sum("cs").alias("ns"))
    tot = vocab.agg(F.sum("c").alias("n_total"))
    j = (
        per_src.join(vocab, "tok")
        .join(F.broadcast(src_tot), "source")
        .crossJoin(F.broadcast(tot))
    )
    # per-token term, scaled by the integer weight cs BEFORE snapping:
    # round(cs · ln((cs·N)/(c·ns)) · 1e6) keeps the weighting exact.
    # The integer products go through decimal(38,0) (hugeint in the
    # oracle): cs·N at a 10¹⁴-token corpus would overflow int64
    dec = "decimal(38,0)"
    term_u = F.round(
        F.col("cs").cast("double")
        * F.log(
            (F.col("cs").cast(dec) * F.col("n_total").cast(dec))
            .cast("double")
            / (F.col("c").cast(dec) * F.col("ns").cast(dec))
            .cast("double")
        )
        * F.lit(M)
    ).cast("long")
    g = j.groupBy("source").agg(
        F.max("ns").alias("n_toks"),
        F.sum(term_u).alias("ksum"),
    )
    return g.select(
        "source",
        F.col("n_toks").cast("long").alias("n_toks"),
        F.floor(
            F.col("ksum").cast("double") / F.col("n_toks").cast("double")
        ).cast("long").alias("kl_u"),
    )

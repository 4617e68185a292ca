"""Dedup operator tests: exact groups, n-gram Jaccard, MinHash-LSH
recall/soundness, SimHash identity — numpy/pandas-free oracles built on
tiny in-memory docs plus the sf0.001 documents table."""

from __future__ import annotations

import itertools

import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.dedup import (
    exact_dedup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    shingles,
    simhash_fingerprints,
    simhash_pairs,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog"),
    (1, "the quick brown fox jumps over the lazy cat"),   # near-dup of 0
    (2, "the quick brown fox jumps over the lazy dog"),   # exact dup of 0
    (3, "completely different words entirely here now"),
    (4, "alpha beta gamma delta epsilon zeta eta theta"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def _py_shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_dedup_groups(spark, docs):
    rows = {r.keeper_id: r.n_dups for r in exact_dedup_groups(docs).collect()}
    assert rows[0] == 2          # docs 0 and 2 collapse, keeper is min id
    assert rows[1] == 1 and rows[3] == 1 and rows[4] == 1
    assert 2 not in rows


def test_shingles_match_python(spark, docs):
    got = {
        (r.doc_id, r.shingle) for r in shingles(docs, 3).collect()
    }
    want = {
        (d, s) for d, t in DOCS for s in _py_shingles(t, 3)
    }
    assert got == want


def test_ngram_jaccard_exact(spark, docs):
    got = {
        (r.id_a, r.id_b): (r.inter_n, r.union_n)
        for r in ngram_jaccard_pairs(docs, 3, min_inter=1).collect()
    }
    want = {}
    for (da, ta), (db, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _py_shingles(ta), _py_shingles(tb)
        inter = len(sa & sb)
        if inter >= 1:
            want[(da, db)] = (inter, len(sa | sb))
    assert got == want


def test_minhash_lsh_soundness_and_recall(spark, docs):
    """LSH output must be a subset of exact pairs at the same tau
    (verify step guarantees it) and must find exact/very-near dups."""
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, tau_num=1, tau_den=2).collect()
    }
    exact = set()
    for (da, ta), (db, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _py_shingles(ta), _py_shingles(tb)
        if len(sa | sb) and len(sa & sb) * 2 >= len(sa | sb):
            exact.add((da, db))
    assert lsh <= exact
    assert (0, 2) in lsh  # identical docs always collide in every band


def test_minhash_lsh_sf0001_recall(spark):
    """On the driver's documents table, 8x2 LSH at tau=0.2 must recover
    every exact pair with Jaccard >= 0.8 (collision prob ~0.9998/pair)
    and >= 90% of pairs with Jaccard >= 0.6 — deterministic for this
    seeded data."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = ngram_jaccard_pairs(docs, 3, min_inter=1)
    j08 = {
        (r.id_a, r.id_b)
        for r in exact.where(
            F.col("inter_n") * 10 >= F.col("union_n") * 8
        ).collect()
    }
    j06 = {
        (r.id_a, r.id_b)
        for r in exact.where(
            F.col("inter_n") * 10 >= F.col("union_n") * 6
        ).collect()
    }
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, bands=8, tau_num=1, tau_den=5
        ).collect()
    }
    assert j08 <= lsh, f"missed strong pairs {j08 - lsh}"
    assert len(j06 & lsh) >= 0.9 * len(j06), f"j>=0.6 recall too low"


def test_short_docs_do_not_crash(spark):
    """Docs with fewer than n tokens must emit zero shingles (matching
    the oracle's empty generate_series), not crash with
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT on the descending sequence(1,0)."""
    short = spark.createDataFrame(
        [
            (10, "hi"),                    # 1 token  < n
            (11, "two tokens"),            # 2 tokens < n
            (12, "exactly three tokens"),  # 3 tokens == n -> 1 shingle
            (13, ""),                      # empty text
            (14, "the quick brown fox jumps over the lazy dog"),
            (15, "the quick brown fox jumps over the lazy dog"),
        ],
        "doc_id long, text string",
    )
    got = {(r.doc_id, r.shingle) for r in shingles(short, 3).collect()}
    assert {d for d, _ in got} == {12, 14, 15}
    assert (12, "exactly three tokens") in got
    # full pipelines must survive short docs too
    lsh = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(short, tau_num=1, tau_den=2).collect()
    }
    assert (14, 15) in lsh and all(a >= 12 for a, _ in lsh)
    sim = simhash_pairs(short).collect()
    assert {(r.id_a, r.id_b) for r in sim if r.hamming == 0} == {(14, 15)}
    jac = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(short, 3, min_inter=1).collect()
    }
    assert jac == {(14, 15)}


def test_simhash_identical_docs_hamming_zero(spark, docs):
    fps = {r.doc_id: r.fp for r in simhash_fingerprints(docs).collect()}
    assert fps[0] == fps[2]
    assert 0 <= fps[0] < (1 << 32)
    pairs = {
        (r.id_a, r.id_b): r.hamming for r in simhash_pairs(docs).collect()
    }
    assert pairs[(0, 2)] == 0
    # near-dup differs in few bits, disjoint docs in many
    if (0, 1) in pairs:
        assert pairs[(0, 1)] <= 6
    assert (0, 3) not in pairs or pairs[(0, 3)] > 0


def test_lsh_hot_bucket_cap(spark):
    """max_bucket drops the mega-bucket a shared boilerplate template
    creates, while unrelated near-dup pairs (small buckets) survive."""
    boiler = "common boilerplate header shared by every single document"
    docs = spark.createDataFrame(
        [(i, boiler) for i in range(20)]
        + [(100, "rare unique text alpha beta gamma delta epsilon"),
           (101, "rare unique text alpha beta gamma delta zeta")],
        "doc_id long, text string",
    )
    uncapped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(docs, tau_num=1, tau_den=5).collect()
    }
    capped = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(
            docs, tau_num=1, tau_den=5, max_bucket=5
        ).collect()
    }
    # boilerplate clique: 20*19/2 pairs uncapped, all pruned by the cap
    assert len(uncapped) >= 190
    assert all(a >= 100 for a, _ in capped), capped
    assert (100, 101) in capped  # small-bucket pair survives


def test_ngram_max_df_stop_shingles(spark):
    boiler = "the same header line on all docs"
    docs = spark.createDataFrame(
        [(i, boiler + f" unique tail {i} {i} {i}") for i in range(10)],
        "doc_id long, text string",
    )
    uncapped = ngram_jaccard_pairs(docs, min_inter=1).count()
    capped = ngram_jaccard_pairs(docs, min_inter=1, max_df=2).count()
    assert uncapped == 45       # all pairs share the boilerplate shingles
    assert capped == 0          # stop-shingles removed, tails are unique


def test_xxhash_mode_sound_and_finds_dups(spark, docs):
    """Scale mode (xxhash64 ids, no vocabulary build): verified pairs
    are still a subset of the exact Jaccard pairs (ids differ but set
    geometry doesn't), and identical docs always collide.  Band recall
    for borderline-j pairs is mode-dependent by design, so exact
    set-equality with vocab mode is NOT asserted."""
    exact = set()
    for (da, ta), (db, tb) in itertools.combinations(DOCS, 2):
        sa, sb = _py_shingles(ta), _py_shingles(tb)
        if len(sa | sb) and len(sa & sb) * 2 >= len(sa | sb):
            exact.add((da, db))
    got = {
        (r.id_a, r.id_b): (r.inter_n, r.union_n)
        for r in minhash_lsh_pairs(docs, mode="xxhash64",
                                   tau_num=1, tau_den=2).collect()
    }
    assert set(got) <= exact
    assert (0, 2) in got and got[(0, 2)][0] == got[(0, 2)][1]


def test_connected_components_hand_graph(spark):
    """Chain 1-2-3, separate pair 10-11, triangle 20-21-22 with a
    redundant edge: every node labels with its component's min id."""
    from timeseriescorrelation_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        "id_a long, id_b long",
    )
    got = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(edges).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_connected_components_long_chain(spark):
    """A 12-node path needs multiple propagation rounds; the fixpoint
    loop must converge (diameter 11 < max_iter) with one label."""
    from timeseriescorrelation_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(100, 112)], "id_a long, id_b long"
    )
    labels = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(edges).collect()
    }
    assert set(labels.values()) == {100}
    assert len(labels) == 13


def test_cc_star_matches_propagation(spark):
    """Large-star/small-star produces the EXACT labeling of the
    propagation variant on hand graphs + a seeded random graph."""
    import random

    from timeseriescorrelation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    rng = random.Random(7)
    rand_edges = [
        (rng.randrange(0, 60), rng.randrange(0, 60)) for _ in range(80)
    ]
    for edge_list in [
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (20, 22)],
        [(i, i + 1) for i in range(100, 112)],
        [(a, b) for a, b in rand_edges if a != b],
    ]:
        edges = spark.createDataFrame(edge_list, "id_a long, id_b long")
        want = {
            r["doc_id"]: r["cluster"]
            for r in connected_components(edges).collect()
        }
        got = {
            r["doc_id"]: r["cluster"]
            for r in connected_components_star(edges).collect()
        }
        assert got == want


def test_cc_star_fewer_rounds_on_chain(spark):
    """A 64-node path: propagation needs ~diameter/hops rounds, the
    star rewrites halve path lengths per alternation — measured round
    counts must show the log-vs-linear gap (VERDICT r02 #4)."""
    from timeseriescorrelation_spark.operators.dedup import (
        connected_components,
        connected_components_star,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(64)], "id_a long, id_b long"
    )
    s_prop: dict = {}
    s_star: dict = {}
    want = {
        r["doc_id"]: r["cluster"]
        for r in connected_components(
            edges, max_iter=64, stats=s_prop
        ).collect()
    }
    got = {
        r["doc_id"]: r["cluster"]
        for r in connected_components_star(
            edges, max_iter=64, stats=s_star
        ).collect()
    }
    assert got == want and set(got.values()) == {0}
    assert s_star["rounds"] < s_prop["rounds"], (s_star, s_prop)
    assert s_star["rounds"] <= 8, s_star  # ~log2(64) + probe round


def test_containment_catches_embedded_doc(spark):
    """A short doc fully embedded in a long one: Jaccard is low (no
    ngram_jaccard hit at 20%) but containment of the smaller set is
    100% — exactly the asymmetric case the operator exists for."""
    from timeseriescorrelation_spark.operators.dedup import (
        containment_pairs,
        ngram_jaccard_pairs,
    )

    small = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"tok{i} tok{i+1} tok{i+2}" for i in range(0, 60, 3))
    big = filler + " " + small + " " + filler.upper()
    docs = spark.createDataFrame(
        [(1, small), (2, big), (3, "unrelated words only here now")],
        "doc_id long, text string",
    )
    got = containment_pairs(docs, n=3, min_inter=2, tau_pct=80).collect()
    assert len(got) == 1
    r = got[0]
    assert (r.id_a, r.id_b) == (1, 2)
    assert r.inter_n == r.sz_a          # fully contained
    assert r.cont_a == 1.0 and r.cont_b < 0.2
    # symmetric Jaccard at the 20% gate misses this pair entirely
    jac = ngram_jaccard_pairs(docs, n=3, min_inter=2).collect()
    assert all(
        p.inter_n * 5 < p.union_n
        for p in jac
        if (p.id_a, p.id_b) == (1, 2)
    )

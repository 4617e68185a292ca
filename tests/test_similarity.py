"""Similarity-search tests: unit-vector math vs numpy, brute-force
top-k exactness, IVF recall vs brute force on the driver embeddings."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from timeseriescorrelation_spark.operators.similarity import (
    ann_topk_bruteforce,
    ann_topk_bruteforce_np,
    ann_topk_ivf,
    cosine_neardup_pairs,
    with_unit_vectors,
)


@pytest.fixture(scope="module")
def embs(spark):
    df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    df.cache()
    df.count()
    return df


def _np_vectors(embs):
    pdf = embs.toPandas().sort_values("vec_id")
    ids = pdf["vec_id"].to_numpy()
    mat = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    return ids, mat / np.linalg.norm(mat, axis=1, keepdims=True)


def test_unit_vectors_match_numpy(spark, embs):
    ids, unit = _np_vectors(embs)
    got = {
        r.vec_id: np.array(r.v)
        for r in with_unit_vectors(embs).collect()
    }
    for i, vid in enumerate(ids):
        np.testing.assert_allclose(got[vid], unit[i], rtol=0, atol=1e-12)


def test_bruteforce_topk_matches_numpy(spark, embs):
    ids, unit = _np_vectors(embs)
    sims = unit @ unit.T
    qmask = ids < 5
    got = ann_topk_bruteforce(
        embs, embs.where(F.col("vec_id") < 5), k=10
    ).collect()
    by_q: dict[int, list] = {}
    for r in sorted(got, key=lambda r: (r.qid, r.rank)):
        by_q.setdefault(r.qid, []).append((r.nid, r.cos))
    for qi, qid in enumerate(ids[qmask]):
        row = sims[np.where(ids == qid)[0][0]].copy()
        row[np.where(ids == qid)[0][0]] = -np.inf
        # numpy oracle ranks by (rounded cos desc, nid asc) like the op
        order = sorted(
            [(round(row[j], 6), -ids[j]) for j in range(len(ids))
             if ids[j] != qid],
            key=lambda t: (-t[0], -t[1]),
        )[:10]
        want = [(-nid, c) for c, nid in order]
        assert by_q[qid] == [(n, pytest.approx(c, abs=1e-9))
                             for n, c in want]


def test_ivf_recall_vs_bruteforce(spark):
    """IVF with nprobe=3 of 10 cells must keep recall@10 >= 0.5 on the
    clustered synthetic embeddings (deterministic for this seed).

    Uses sf0.01 (500 vectors): at sf0.001 each cell holds ~5 vectors,
    so top-10-of-49 structurally spans >3 cells and recall is bounded
    by the probe fraction, not the index quality."""
    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 5)
    bf = ann_topk_bruteforce(embs, q, k=10).collect()

    def sets(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    bf_sets = sets(bf)

    # probing every cell must reproduce brute force EXACTLY
    full = ann_topk_ivf(embs, q, k=10, nprobe=10).collect()
    assert sorted((r.qid, r.rank, r.nid, r.cos) for r in full) == sorted(
        (r.qid, r.rank, r.nid, r.cos) for r in bf
    )

    # nprobe=3 of 10: recall floor (weakly-clustered synthetic data —
    # max pairwise cos is ~0.46, so cells only loosely track cosine
    # neighborhoods; this is a sanity floor, not an index-quality bar)
    ivf_sets = sets(ann_topk_ivf(embs, q, k=10, nprobe=3).collect())
    recalls = [
        len(bf_sets[q_] & ivf_sets.get(q_, set())) / len(bf_sets[q_])
        for q_ in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.4, recalls


def test_kmeans_centroids_recall(spark):
    """Real Lloyd's centroids: nprobe=all must reproduce brute force
    EXACTLY (IVF partitions, it never loses vectors), and nprobe=3 of 8
    kmeans cells must beat the probe-fraction recall floor on the
    clustered sf0.01 embeddings (deterministic seed)."""
    from timeseriescorrelation_spark.operators.similarity import (
        kmeans_centroids,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 5)
    cents = kmeans_centroids(embs, k=8, n_iter=2).cache()
    assert cents.count() == 8  # no cell collapsed on this data

    bf = ann_topk_bruteforce(embs, q, k=10).collect()
    full = ann_topk_ivf(embs, q, k=10, nprobe=8, centroids=cents).collect()
    assert sorted((r.qid, r.rank, r.nid, r.cos) for r in full) == sorted(
        (r.qid, r.rank, r.nid, r.cos) for r in bf
    )

    def sets(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    bf_sets = sets(bf)
    ivf_sets = sets(
        ann_topk_ivf(embs, q, k=10, nprobe=3, centroids=cents).collect()
    )
    recalls = [
        len(bf_sets[q_] & ivf_sets.get(q_, set())) / len(bf_sets[q_])
        for q_ in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.5, recalls
    cents.unpersist()


def test_numpy_bruteforce_matches_hof(spark, embs):
    """The BLAS scale path must return the same neighbor ranking as the
    oracle-path HOF variant (cos compared at the rounded precision the
    ranking itself uses)."""
    q = embs.where(F.col("vec_id") < 5)
    hof = sorted(
        (r.qid, r.rank, r.nid) for r in
        ann_topk_bruteforce(embs, q, k=10).collect()
    )
    np_ = sorted(
        (r.qid, r.rank, r.nid) for r in
        ann_topk_bruteforce_np(embs, q.toPandas(), k=10).collect()
    )
    assert hof == np_


def test_blocked_neardup_matches_hof(spark, embs):
    """Block-matmul near-dup must find the same pairs as the HOF path
    (cos compared at the rounded precision both emit)."""
    from timeseriescorrelation_spark.operators.similarity import (
        cosine_neardup_pairs_blocked,
    )

    hof = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_neardup_pairs(embs, 0.2).collect()
    }
    blk = {
        (r.id_a, r.id_b): r.cos
        for r in cosine_neardup_pairs_blocked(embs, 0.2).collect()
    }
    assert set(hof) == set(blk)
    for k in hof:
        assert abs(hof[k] - blk[k]) <= 1e-6


def test_neardup_pairs_symmetric_bound(spark, embs):
    """Every reported pair has id_a < id_b and cos within [-1, 1]."""
    rows = cosine_neardup_pairs(embs, min_cos=0.2).collect()
    assert rows, "threshold too high for fixture"
    for r in rows:
        assert r.id_a < r.id_b
        assert -1.000001 <= r.cos <= 1.000001
        assert r.cos >= 0.2


def test_pq_adc_refine_recall(spark):
    """Product quantization: raw ADC ranks coarsely (codes collapse
    within-cluster neighbors — measured recall@10 ≈ 0.4), and the
    standard refine stage (exact re-rank of the ADC top-100 shortlist)
    recovers ≥ 0.9 on the clustered synthetic corpus.  Also pins the
    PQ economics claim: the refine join touches |q|·refine float rows,
    never the corpus."""
    from timeseriescorrelation_spark.operators.similarity import (
        pq_codebooks,
        pq_encode,
        pq_topk_adc,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 5)
    bf = ann_topk_bruteforce(embs, q, k=10).collect()

    def sets(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    bf_sets = sets(bf)
    cb = pq_codebooks(embs, m=16, ksub=32, n_iter=2)
    codes = pq_encode(embs, cb, m=16)
    # codes are m ints in [0, ksub): the compressed representation
    crow = codes.limit(1).collect()[0]
    assert len(crow.codes) == 16
    assert all(0 <= c < 32 for c in crow.codes)

    refined = sets(
        pq_topk_adc(embs, q, k=10, m=16, ksub=32,
                    codebooks=cb, codes=codes, refine=100).collect()
    )
    recalls = [
        len(bf_sets[q_] & refined.get(q_, set())) / len(bf_sets[q_])
        for q_ in bf_sets
    ]
    assert sum(recalls) / len(recalls) >= 0.9, recalls


def test_ivf_pq_recall(spark):
    """IVF-PQ residual encoding: with every cell probed the
    PQ-residual + refine machinery recovers brute-force top-10
    (recall 1.0 measured; pinned ≥ 0.95), and cell pruning at
    nprobe=4/8 still clears 0.6 — the coarse-quantizer recall trade
    the nprobe knob is FOR."""
    from timeseriescorrelation_spark.operators.similarity import (
        ann_topk_bruteforce,
        ivf_pq_topk,
    )

    embs = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    q = embs.where(F.col("vec_id") < 5)

    def sets(rows):
        out: dict[int, set] = {}
        for r in rows:
            out.setdefault(r.qid, set()).add(r.nid)
        return out

    bf = sets(ann_topk_bruteforce(embs, q, k=10).collect())

    def recall(nprobe):
        got = sets(
            ivf_pq_topk(embs, q, k=10, n_cells=8, nprobe=nprobe,
                        m=16, ksub=32, refine=100).collect()
        )
        rec = [len(bf[x] & got.get(x, set())) / len(bf[x]) for x in bf]
        return sum(rec) / len(rec)

    assert recall(8) >= 0.95
    assert recall(4) >= 0.6


def test_dim_ablation_full_dims_is_identity(spark):
    """keep_dims = d reproduces the full ranking: overlap@k == k."""
    import numpy as np
    from timeseriescorrelation_spark.operators.similarity import (
        dim_ablation_overlap,
    )

    rng = np.random.default_rng(7)
    rows = [(i, rng.normal(size=8).astype(float).tolist())
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dim_ablation_overlap(df, n_queries=3, k=5, keep_dims=8).collect()
    assert len(out) == 3
    assert all(r["n_overlap"] == 5 and r["overlap_frac"] == 1.0
               for r in out)


def test_dim_ablation_discriminating_prefix(spark):
    """Vectors whose identity lives in the FIRST dims keep overlap 1.0
    under truncation; vectors differing only in the TAIL dims lose it."""
    from timeseriescorrelation_spark.operators.similarity import (
        dim_ablation_overlap,
    )

    # corpus: 10 vectors identical in dims 0-1, unique in dims 2-3
    rows = [(i, [1.0, 1.0, float(i), float(i % 3)]) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = dim_ablation_overlap(df, n_queries=2, k=3, keep_dims=2).collect()
    # truncated space collapses everything onto one direction: ranking
    # degenerates to id order, so overlap is strictly below 1 for at
    # least one query (the tail carried all the signal)
    assert any(r["overlap_frac"] < 1.0 for r in out)


def test_int8_recall_exact_on_orthogonal_and_zero_guard(spark):
    from timeseriescorrelation_spark.operators.similarity import (
        int8_quantize_recall,
    )

    # axis-aligned + mixtures: int8 SQ cannot reorder these; plus a
    # zero vector (id 9) that must quantize to zeros, not crash
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0, 0.0]),
        (2, [0.8, 0.2, 0.0, 0.0]),
        (3, [0.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 0.0]),
        (5, [0.5, 0.5, 0.5, 0.5]),
        (6, [-1.0, 0.0, 0.0, 0.0]),
        (7, [0.7, 0.3, 0.1, 0.0]),
        (8, [0.1, 0.1, 0.8, 0.0]),
        (9, [0.0, 0.0, 0.0, 0.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    res = int8_quantize_recall(df, n_queries=2, k=3).collect()
    assert len(res) == 2
    assert all(r.k == 3 for r in res)
    assert all(r.recall == 1.0 for r in res)


def test_int8_recall_on_driver_embeddings(spark, embs):
    from timeseriescorrelation_spark.operators.similarity import (
        int8_quantize_recall,
    )

    res = int8_quantize_recall(embs, n_queries=3, k=10).collect()
    assert len(res) == 3
    # 64-dim unit vectors at int8: recall@10 should be essentially
    # perfect; anything under 0.8 means the quantizer is broken
    assert min(r.recall for r in res) >= 0.8


def test_embedding_covariance_matches_numpy_and_pca(spark):
    """Entry-exact covariance equals numpy's population cov of the
    SAME µ-snapped matrix, and driver-side eigh on the assembled
    matrix recovers the planted dominant direction."""
    import numpy as np

    from timeseriescorrelation_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(3)
    d, n = 6, 400
    direction = rng.randn(d); direction /= np.linalg.norm(direction)
    X = rng.randn(n, d) * 0.05 + np.outer(rng.randn(n) * 2.0, direction)
    Xu = np.round(X * 1e6) / 1e6  # what the operator sees after snap
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    # NOTE: operator snaps from the FLOAT column cast to double
    Xf = np.round(np.array(X, dtype=np.float32).astype(np.float64)
                  * 1e6) / 1e6
    out = embedding_covariance(df).collect()
    C = np.zeros((d, d))
    for r in out:
        C[r.i - 1, r.j - 1] = r.cov
        C[r.j - 1, r.i - 1] = r.cov
    ref = np.cov(Xf, rowvar=False, bias=True)
    assert np.abs(C - ref).max() < 2e-6  # 6-dp rounding of exact cov
    evals, evecs = np.linalg.eigh(C)
    top = evecs[:, -1]
    assert abs(abs(top @ direction)) > 0.99
    assert evals[-1] / evals.sum() > 0.9


def test_auc_by_label_separable_and_ties(spark):
    """Perfectly separable geometry: label-0 train+eval vectors along
    +e1, label-1 along +e2 (unit axes) — centroid cosine ranks every
    same-label eval vector strictly above the rest, so AUC = 1.0 for
    both labels.  n_pos/n_neg bookkeeping checked exactly."""
    from timeseriescorrelation_spark.operators.similarity import (
        auc_by_label,
    )

    rows = []
    # even ids = train, odd ids = eval; 4 of each label in each half
    for i in range(8):
        vid = i            # 0..7: label 0 on axis e1
        rows.append((vid * 2, [1.0, 0.0], 0))
        rows.append((vid * 2 + 1, [1.0, 0.0], 0))
    for i in range(8):
        rows.append((100 + i * 2, [0.0, 1.0], 1))
        rows.append((101 + i * 2, [0.0, 1.0], 1))
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    got = {r.label: r for r in auc_by_label(emb).collect()}
    assert got[0].auc == 1.0 and got[1].auc == 1.0
    assert got[0].n_pos == 8 and got[0].n_neg == 8


def test_auc_by_label_all_tied_is_half(spark):
    """Every eval vector identical -> every score ties -> the midrank
    formula must give exactly 0.5 (the degenerate case a naive
    greater-than count gets wrong)."""
    from timeseriescorrelation_spark.operators.similarity import (
        auc_by_label,
    )

    rows = [(i, [1.0, 1.0], (i // 2) % 2) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int")
    for r in auc_by_label(emb).collect():
        assert r.auc == 0.5


def test_ndcg_int8_perfect_when_order_preserved(spark):
    """Well-separated axis-aligned vectors: int8 quantization cannot
    reorder them, so every query's NDCG@10 is exactly 1.0 and
    dcg_u equals the ideal 29966114."""
    from timeseriescorrelation_spark.operators.similarity import (
        ndcg_int8_at_k,
    )

    # components [127, 5i]: after unit-normalization the max|comp|
    # scale is 127/n, so q = round(127*v/s) recovers the ORIGINAL
    # integers exactly and the quantized score equals the true cosine
    # in exact arithmetic — rankings provably identical
    rows = [(i, [127.0, float(5 * i)]) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    got = ndcg_int8_at_k(emb, n_queries=3).collect()
    assert len(got) == 3
    for r in got:
        assert r.ndcg == 1.0 and r.dcg_u == 29966114


def test_rbo_identical_rankings_is_one(spark):
    """Losslessly-quantizable vectors ([127, 5i]) force identical
    exact/int8 rankings: normalized truncated RBO must be exactly 1.0
    with all 10 candidates common and rbo_u equal to the constant
    2520*(10^10 - 9^10)."""
    from timeseriescorrelation_spark.operators.similarity import (
        RBO_C10,
        rbo_int8_at_k,
    )

    rows = [(i, [127.0, float(5 * i)]) for i in range(20)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>")
    got = rbo_int8_at_k(emb, n_queries=3).collect()
    assert len(got) == 3
    for r in got:
        assert r.n_common == 10
        assert r.rbo_u == RBO_C10
        assert r.rbo == 1.0


def test_pca_invariants(spark, embs):
    from timeseriescorrelation_spark.operators.similarity import pca_project

    p = 3
    pdf = pca_project(embs, n_components=p).toPandas().sort_values("vec_id")
    raw = embs.toPandas()
    X = np.stack(
        raw.sort_values("vec_id")["embedding"].to_numpy()
    ).astype(np.float64)
    # snap to the operator's µ-unit grid so the reference covariance
    # matches the exact-decimal path it eigendecomposes
    Xu = np.round(X * 1e6) / 1e6
    Xc = Xu - Xu.mean(axis=0)
    cov = (Xc.T @ Xc) / len(Xu)
    evals = np.sort(np.linalg.eigvalsh(cov))[::-1]
    S = pdf[[f"pc{i + 1}" for i in range(p)]].to_numpy()
    # Var(pc_k) == lambda_k (population), components uncorrelated
    got_var = S.var(axis=0)
    assert np.allclose(got_var, evals[:p], rtol=1e-3)
    C = np.cov(S.T, bias=True)
    off = C - np.diag(np.diag(C))
    assert np.max(np.abs(off)) < 1e-3 * evals[0]
    # explained-variance ratios descend and match eigenvalues/trace
    evr = pdf[[f"evr{i + 1}" for i in range(p)]].iloc[0].to_numpy()
    assert np.all(np.diff(evr) <= 1e-12)
    assert np.allclose(evr, evals[:p] / np.trace(cov), atol=1e-4)


def test_pca_whiten_unit_variance(spark, embs):
    from timeseriescorrelation_spark.operators.similarity import pca_project

    pdf = pca_project(embs, n_components=2, whiten=True).toPandas()
    S = pdf[["pc1", "pc2"]].to_numpy()
    assert np.allclose(S.var(axis=0), 1.0, rtol=1e-3)


def test_covariance_gram_equals_exact(spark):
    """mode="gram" (one-pass partial integer Gram per partition) must
    reproduce the exact join form to the last emitted digit — the
    snap-before-sum design makes the two physical plans aggregate the
    SAME integers regardless of partitioning."""
    import numpy as np

    from timeseriescorrelation_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(9)
    d, n = 7, 300
    X = rng.randn(n, d) * np.linspace(0.2, 3.0, d)
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    ).repartition(5)  # multiple partitions → multiple partial Grams
    key = lambda r: (r.i, r.j)
    exact = sorted(embedding_covariance(df).collect(), key=key)
    gram = sorted(
        embedding_covariance(df, mode="gram").collect(), key=key
    )
    assert len(exact) == d * (d + 1) // 2 == len(gram)
    for e, g in zip(exact, gram):
        assert (e.i, e.j, e.n) == (g.i, g.j, g.n)
        assert e.cov == g.cov, (e.i, e.j, e.cov, g.cov)


def test_covariance_gram_blocked_matmul_no_overflow(spark):
    """Large-magnitude embeddings force the int64-overflow guard to
    block the matmul (max|xu| ~ 3e8 → products ~1e17, so ~46-row
    blocks); results must still equal the exact form."""
    import numpy as np

    from timeseriescorrelation_spark.operators.similarity import (
        embedding_covariance,
    )

    rng = np.random.RandomState(4)
    d, n = 3, 200
    X = rng.randn(n, d) * 300.0  # xu up to ~1e9 in µ-units
    df = spark.createDataFrame(
        [(i, [float(v) for v in X[i]]) for i in range(n)],
        "vec_id long, embedding array<double>",
    ).repartition(3)
    key = lambda r: (r.i, r.j)
    exact = sorted(embedding_covariance(df).collect(), key=key)
    gram = sorted(
        embedding_covariance(df, mode="gram").collect(), key=key
    )
    for e, g in zip(exact, gram):
        assert e.cov == g.cov, (e.i, e.j, e.cov, g.cov)

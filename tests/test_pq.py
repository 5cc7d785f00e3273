"""IVF-PQ: the full train -> encode -> ADC chain differentially checked
against an independent numpy replication (smallest-id init, grid-quantized
Lloyd round, first-index argmin ties, per-subspace lookup tables)."""

import numpy as np
import pytest

from lucene_solr_spark.textops.similarity import pq_encode, pq_topk, pq_train

M, KSUB, DIMS = 4, 8, 64
SUBDIM = DIMS // M
QUANT = 1e6


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_state(emb):
    rows = emb.orderBy("vec_id").collect()
    V = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    books = []
    for s in range(M):
        X = V[:, s * SUBDIM : (s + 1) * SUBDIM]
        init_mask = ids < KSUB
        C = X[init_mask][np.argsort(ids[init_mask])].copy()
        d = ((X[:, None, :] - C[None, :, :]) ** 2).sum(2)
        a = d.argmin(1)
        C2 = C.copy()
        for c in range(KSUB):
            mask = a == c
            if mask.any():
                sq = np.floor(X[mask] * QUANT + 0.5).astype(np.int64).sum(0)
                C2[c] = (sq / mask.sum()) / QUANT
        books.append(C2)
    codes = np.stack(
        [
            ((V[:, s * SUBDIM : (s + 1) * SUBDIM][:, None, :] - books[s][None, :, :]) ** 2)
            .sum(2)
            .argmin(1)
            for s in range(M)
        ],
        axis=1,
    )
    return V, ids, books, codes


def test_codebooks_match_numpy(emb, np_state):
    _, _, books_np, _ = np_state
    books = pq_train(emb, m=M, ksub=KSUB, iters=1)
    for s in range(M):
        assert np.allclose(np.array(books[s]), books_np[s], atol=1e-12), s


def test_codes_match_numpy(emb, np_state):
    _, ids, _, codes_np = np_state
    books = pq_train(emb, m=M, ksub=KSUB, iters=1)
    got = {r.vec_id: list(r.codes) for r in pq_encode(emb, books).collect()}
    want = {int(i): list(map(int, c)) for i, c in zip(ids, codes_np)}
    assert got == want


def test_adc_topk_matches_numpy(emb, np_state):
    V, ids, books_np, codes_np = np_state
    books = pq_train(emb, m=M, ksub=KSUB, iters=1)
    codes = pq_encode(emb, books)
    qv = [float(x) for x in emb.where("vec_id = 0").first().embedding]
    out = pq_topk(codes, books, qv, k=10, exclude_id=0).collect()

    q = np.array(qv)
    dist = np.zeros(len(V))
    for s in range(M):
        t = ((q[s * SUBDIM : (s + 1) * SUBDIM][None, :] - books_np[s]) ** 2).sum(1)
        dist += t[codes_np[:, s]]
    want = sorted(
        (round(float(d), 4), int(i)) for d, i in zip(dist, ids) if i != 0
    )[:10]
    assert [(r.approx_dist, r.vec_id) for r in out] == want


def test_compression_and_distance_correlation(emb, np_state):
    """PQ is lossy by design; the meaningful sanity is that ADC distances
    CORRELATE with exact distances (they do even on this structureless
    uniform-random corpus — real embedding corpora cluster and correlate
    far higher), and codes live in [0, ksub) (the 64x memory story:
    m bytes vs 256 B float32)."""
    V, ids, books_np, codes_np = np_state
    qv = [float(x) for x in emb.where("vec_id = 0").first().embedding]
    q = np.array(qv)
    dist = np.zeros(len(V))
    for s in range(M):
        t = ((q[s * SUBDIM : (s + 1) * SUBDIM][None, :] - books_np[s]) ** 2).sum(1)
        dist += t[codes_np[:, s]]
    exact_d = ((V - q[None, :]) ** 2).sum(1)
    mask = ids != 0
    corr = float(np.corrcoef(dist[mask], exact_d[mask])[0, 1])
    assert corr > 0.4, corr  # measured 0.56 on the sf0.01 uniform corpus
    assert all(0 <= c < KSUB for row in codes_np for c in row)


def test_pq_recall_on_clustered_corpus(spark):
    """On data with real cluster structure (what embedding corpora look
    like), ADC over PQ codes retrieves the query's CLUSTER: within-cluster
    distances sit below the quantization resolution (same codes -> equal
    approx distance), so the guarantee is cluster-level neighbors, with
    exact re-ranking (cosine_topk over the candidates) recovering the fine
    order — the standard PQ + refine pipeline."""
    rng = np.random.RandomState(11)
    n_clusters, per, dims = 10, 40, 64
    centers = rng.uniform(-1.0, 1.0, size=(n_clusters, dims))
    V = np.vstack([
        centers[c] + rng.normal(0, 0.05, size=(per, dims))
        for c in range(n_clusters)
    ])
    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(V)],
        "vec_id long, embedding array<double>",
    )
    books = pq_train(emb, m=M, ksub=KSUB, iters=1)
    codes = pq_encode(emb, books)
    qv = [float(x) for x in V[0]]
    approx = {
        r.vec_id
        for r in pq_topk(codes, books, qv, k=10, exclude_id=0).collect()
    }
    # every retrieved id belongs to the query's cluster (ids 0..per-1)
    assert approx and all(i < per for i in approx), sorted(approx)
    # and exact re-rank over a wider ADC candidate set recovers the true
    # top-10 (the refine step)
    from lucene_solr_spark.textops.similarity import cosine_topk

    cand_ids = {
        r.vec_id
        for r in pq_topk(codes, books, qv, k=50, exclude_id=0).collect()
    }
    cand = emb.where(emb.vec_id.isin([int(i) for i in cand_ids]))
    refined = [r.vec_id for r in cosine_topk(cand, qv, k=10, exclude_id=0).collect()]
    exact_cos = (V @ np.array(qv)) / (
        np.linalg.norm(V, axis=1) * np.linalg.norm(qv)
    )
    want = [
        i for _, i in sorted(((-c, i) for i, c in enumerate(exact_cos) if i != 0))
    ][:10]
    assert len(set(refined) & set(want)) >= 8, (refined, want)


def test_pq_refined_recovers_exact_topk(emb):
    """PQ + refine on the real corpus: with a 10%-of-corpus candidate set
    the refined top-10 equals the exact brute-force cosine top-10."""
    from lucene_solr_spark.textops.similarity import (
        cosine_topk,
        pq_topk_refined,
    )

    books = pq_train(emb, m=M, ksub=KSUB, iters=1)
    codes = pq_encode(emb, books)
    qv = [float(x) for x in emb.where("vec_id = 0").first().embedding]
    ref = pq_topk_refined(
        codes, books, emb, qv, k=10, n_candidates=200, exclude_id=0
    ).collect()
    exact = cosine_topk(emb, qv, k=10, exclude_id=0).collect()
    assert {r.vec_id for r in ref} == {r.vec_id for r in exact}

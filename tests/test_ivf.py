"""IVF-flat ANN: numpy differential for the deterministic quantized k-means
(train + assign) and recall sanity for the probe-restricted search."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.textops.similarity import (
    cosine_topk,
    ivf_assign,
    ivf_topk,
    ivf_train,
)

C, PROBE = 8, 2


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


@pytest.fixture(scope="module")
def mat(emb):
    rows = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    m = np.array([[float(x) for x in r.embedding] for r in rows])
    order = np.argsort(ids)
    return ids[order], m[order]


def _np_train(ids, m, iters=1):
    cents = m[ids < C].copy()
    for _ in range(iters):
        a = _np_assign(m, cents)
        q = np.floor(m * 1e6 + 0.5).astype(np.int64)
        for c in range(C):
            sel = q[a == c]
            if len(sel):
                cents[c] = (sel.sum(axis=0) / len(sel)) / 1e6
    return cents


def _np_assign(m, cents):
    # same formula text: (dxx - 2*dxc) + dcc, strict < keeps smaller cid
    d = (
        (m * m).sum(axis=1)[:, None]
        - 2.0 * (m @ cents.T)
        + (cents * cents).sum(axis=1)[None, :]
    )
    return d.argmin(axis=1)  # argmin returns first minimum = smallest cid


def test_train_matches_numpy(emb, mat):
    ids, m = mat
    got = np.array(ivf_train(emb, n_centroids=C, iters=1))
    want = _np_train(ids, m, iters=1)
    # the engine's fold-order sums differ from numpy's pairwise sums only
    # in the unquantized distance ranking; centroids themselves come from
    # exact integer sums and must agree to float noise
    assert np.allclose(got, want, atol=1e-9)


def test_assign_matches_numpy(emb, mat):
    ids, m = mat
    cents = ivf_train(emb, n_centroids=C, iters=1)
    got = {
        r.vec_id: r.cid for r in ivf_assign(emb, cents).collect()
    }
    want = _np_assign(m, np.array(cents))
    mismatch = [(i, got[i], int(w)) for i, w in zip(ids, want) if got[i] != w]
    assert not mismatch, mismatch[:5]


def test_probe_recall_and_exactness(emb):
    """Probe search returns exact cosines (subset of brute force) and
    reasonable recall at 2/8 probes."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    cents = ivf_train(emb, n_centroids=C, iters=1)
    ivf = ivf_topk(emb, qv, cents, k=10, n_probe=PROBE, exclude_id=0).collect()
    brute = cosine_topk(emb, qv, k=50, exclude_id=0).collect()
    brute_map = {r.vec_id: r.cosine for r in brute}
    # every IVF hit carries its exact brute-force cosine
    for r in ivf:
        assert r.vec_id in brute_map and r.cosine == brute_map[r.vec_id]
    # recall@10 against the exact top-10 is imperfect by design but real
    top10 = {r.vec_id for r in brute[:10]}
    hit = sum(1 for r in ivf if r.vec_id in top10)
    assert hit >= 3, f"recall@10 too low: {hit}/10"


def test_indexed_search_equals_query_time_assignment(emb, tmp_path):
    """IvfIndex.search over the persisted cid-partitioned layout returns
    exactly what the legacy query-time-assignment path returns, while the
    scan provably touches ONLY the probed cells (partition pruning: every
    input file of the searched frame lives under a probed cid= dir)."""
    from lucene_solr_spark.textops.similarity import (
        _probe_cells,
        ivf_build,
    )

    spark = emb.sparkSession
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    root = str(tmp_path / "ivf")
    index = ivf_build(emb, root, n_centroids=C, iters=1)
    got = index.search(spark, qv, k=10, n_probe=PROBE, exclude_id=0).collect()
    cents = ivf_train(emb, n_centroids=C, iters=1)
    want = ivf_topk(emb, qv, cents, k=10, n_probe=PROBE, exclude_id=0).collect()
    assert [(r.vec_id, r.cosine) for r in got] == [
        (r.vec_id, r.cosine) for r in want
    ]
    # the pruning receipt: the cid filter lands as a PARTITION filter on
    # the scan (metadata pruning — the non-probed cells' files are never
    # opened), not a post-scan data filter
    probe = _probe_cells(qv, index.cents, PROBE)
    pruned = index.cells(spark).where(F.col("cid").isin(probe))
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cid" in plan.split(
        "PartitionFilters", 1
    )[1].split("]", 1)[0], plan
    # and the pruned scan actually surfaces only probed cids
    seen = {r.cid for r in pruned.select("cid").distinct().collect()}
    assert seen <= set(probe) and seen, (seen, probe)
    # idempotent rebuild: second call reuses the persisted model + layout
    again = ivf_build(emb, root, n_centroids=C, iters=1)
    assert again.cents == index.cents


def test_full_probe_equals_brute_force(emb):
    """n_probe = C degenerates to exact search — the correctness anchor."""
    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).first().embedding]
    cents = ivf_train(emb, n_centroids=C, iters=1)
    ivf = ivf_topk(emb, qv, cents, k=10, n_probe=C, exclude_id=0).collect()
    brute = cosine_topk(emb, qv, k=10, exclude_id=0).collect()
    assert [(r.vec_id, r.cosine) for r in ivf] == [
        (r.vec_id, r.cosine) for r in brute
    ]

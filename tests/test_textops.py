"""Training-data operators: dedup / similarity / analysis / multimodal."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet").persist()


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{sf_dir}/embeddings.parquet'")
    return c


def _cmp(sdf, odf, round_dp=4):
    import pandas as pd

    cols = sorted(sdf.columns)
    assert cols == sorted(odf.columns)

    def norm(df):
        df = df[cols].copy()
        for c in cols:
            if df[c].dtype == object:
                try:
                    df[c] = df[c].astype("int64")
                except (TypeError, ValueError):
                    pass
            if str(df[c].dtype).startswith("float"):
                df[c] = df[c].round(round_dp)
        return sorted(map(tuple, df.values.tolist()))

    assert norm(sdf) == norm(odf)


def test_exact_dedup_finds_planted_dups(spark, docs):
    from lucene_solr_spark.textops import exact_dup_groups

    d = docs.select("doc_id", "text")
    aug = d.unionAll(
        d.where(F.col("doc_id") < 5).withColumn("doc_id", F.col("doc_id") + 9999999)
    )
    groups = exact_dup_groups(aug).collect()
    assert len(groups) == 5
    assert all(g.n_dups == 2 for g in groups)
    assert sorted(g.canonical_id for g in groups) == [0, 1, 2, 3, 4]


def test_minhash_near_dup_detects_planted_near_dups(spark, docs):
    from lucene_solr_spark.textops import near_dup_pairs

    d = docs.select("doc_id", "text")
    near = (
        d.where(F.col("doc_id") < 5)
        .withColumn("doc_id", F.col("doc_id") + 500000)
        .withColumn("text", F.concat(F.col("text"), F.lit(" tailtoken")))
    )
    pairs = near_dup_pairs(d.unionAll(near), threshold=0.7)
    found = {(r.docid_a, r.docid_b): r.jaccard for r in pairs.collect()}
    for i in range(5):
        key = (i, i + 500000)
        assert key in found, f"planted near-dup {key} not recalled"
        assert found[key] >= 0.7


def test_simhash_hamming_zero_for_identical_text(spark, docs):
    from lucene_solr_spark.textops import simhash, simhash_near_pairs

    d = docs.select("doc_id", "text").where(F.col("doc_id") < 20)
    aug = d.unionAll(
        d.where(F.col("doc_id") < 3).withColumn("doc_id", F.col("doc_id") + 777000)
    )
    sims = simhash(aug)
    pairs = {
        (r.docid_a, r.docid_b): r.hamming
        for r in simhash_near_pairs(sims, max_hamming=0).collect()
    }
    for i in range(3):
        assert pairs.get((i, i + 777000)) == 0


def test_language_id_sql_parity(spark, docs, con):
    from lucene_solr_spark.oracle.textops_sql import language_id_sql
    from lucene_solr_spark.textops import language_id

    sdf = (
        language_id(docs)
        .groupBy("pred_lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .toPandas()
    )
    _cmp(sdf, con.execute(language_id_sql()).df())


def test_quality_and_fingerprint_sql_parity(spark, docs, con):
    from lucene_solr_spark.oracle.textops_sql import fingerprint_sql, quality_sql
    from lucene_solr_spark.textops import doc_fingerprint, quality_score

    d = docs.where(F.col("doc_id") < 30)
    _cmp(quality_score(d).toPandas(), con.execute(quality_sql(max_docid=30)).df())
    _cmp(
        doc_fingerprint(d).toPandas(),
        con.execute(fingerprint_sql(max_docid=30)).df(),
    )


def test_cosine_topk_exact_vs_duckdb(spark, emb, con):
    from lucene_solr_spark.oracle.textops_sql import cosine_topk_sql
    from lucene_solr_spark.textops import cosine_topk

    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    sdf = cosine_topk(emb, qv, k=10, exclude_id=0).toPandas()
    _cmp(sdf, con.execute(cosine_topk_sql(query_id=0, k=10)).df())


def test_lsh_ann_is_subset_of_exact_ranking(spark, emb):
    """Every ANN hit must appear in the exact brute-force ranking with the
    same cosine (recall may be < 1, correctness of returned scores exact)."""
    from lucene_solr_spark.textops import cosine_topk, lsh_bucketed_topk

    qv = [float(x) for x in emb.where(F.col("vec_id") == 0).collect()[0].embedding]
    exact = {
        r.vec_id: r.cosine
        for r in cosine_topk(emb, qv, k=500, exclude_id=0).collect()
    }
    ann = lsh_bucketed_topk(emb, qv, k=10, exclude_id=0).collect()
    assert len(ann) > 0
    for r in ann:
        assert exact[r.vec_id] == r.cosine


def test_embedding_near_dup_finds_identical_vectors(spark, emb):
    from lucene_solr_spark.textops import embedding_near_dup

    e = emb.select("vec_id", "embedding")
    aug = e.unionAll(
        e.where(F.col("vec_id") < 5).withColumn("vec_id", F.col("vec_id") + 10000)
    )
    pairs = {
        (r.vec_id_a, r.vec_id_b): r.cosine
        for r in embedding_near_dup(aug, threshold=0.999).collect()
    }
    for i in range(5):
        assert pairs.get((i, i + 10000)) == 1.0


def test_multimodal_stub_modes(spark, sf_dir):
    from lucene_solr_spark.pages import pages_from_documents
    from lucene_solr_spark.textops.multimodal import decode_media, sample_frames

    pages = pages_from_documents(spark, sf_dir).limit(5)
    out = decode_media(pages).collect()
    assert len(out) == 5
    for r in out:
        assert 320 <= r.width < 1920 and 240 <= r.height < 1080
        assert r.format in ("png", "jpeg", "webp", "gif")
        assert len(r.features) == 4
    frames = sample_frames(pages, n_frames=3).collect()
    assert len(frames) == 15
    with pytest.raises(NotImplementedError):
        decode_media(pages, mode="real")
    with pytest.raises(NotImplementedError):
        sample_frames(pages, mode="real")


def test_decode_is_deterministic(spark, sf_dir):
    from lucene_solr_spark.pages import pages_from_documents
    from lucene_solr_spark.textops.multimodal import decode_media

    pages = pages_from_documents(spark, sf_dir).limit(10)
    a = sorted(map(tuple, decode_media(pages).drop("features").collect()))
    b = sorted(map(tuple, decode_media(pages.repartition(3)).drop("features").collect()))
    assert a == b


def test_decontaminate_flags_eval_overlap(spark, sf_dir):
    """Benchmark decontamination: docs sharing >= min_overlap distinct
    3-grams with the eval set are flagged; the eval docs themselves are
    (trivially) contaminated; counts match a Python set intersection."""
    from collections import Counter

    from lucene_solr_spark.analysis.analyzer import analyze_text
    from lucene_solr_spark.textops.dedup import decontaminate, shingles

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    bench = shingles(docs.where(F.col("doc_id") < 5))
    got = {
        int(r.docid): (int(r.n_contaminated), bool(r.contaminated))
        for r in decontaminate(docs, bench, min_overlap=3).collect()
    }
    rows = docs.select("doc_id", "text").collect()

    def grams(text):
        t = analyze_text(text)
        return {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}

    bm = set()
    for r in rows:
        if int(r.doc_id) < 5:
            bm |= grams(r.text)
    for r in rows:
        n = len(grams(r.text) & bm)
        assert got[int(r.doc_id)] == (n, n >= 3), r.doc_id
    # eval docs flag themselves
    for d in range(5):
        assert got[d][1]


def test_banded_near_dup_recall_measured(spark):
    """The corpus-scaled banded path trades recall for non-quadratic
    candidates — MEASURE it: plant near-duplicate pairs (cos >= 0.95),
    compare against the brute-force ground truth.  Deterministic seed."""
    import numpy as np

    from lucene_solr_spark.textops.similarity import embedding_near_dup

    rng = np.random.RandomState(7)
    n_base, dims = 400, 64
    base = rng.uniform(-0.34, 0.34, size=(n_base, dims))
    # plant 60 near-dups: base vector + small noise
    idx = rng.choice(n_base, size=60, replace=False)
    noisy = base[idx] + rng.uniform(-0.01, 0.01, size=(60, dims))
    vecs = np.vstack([base, noisy])
    norms = np.linalg.norm(vecs, axis=1, keepdims=True)
    cos = (vecs / norms) @ (vecs / norms).T
    ia, ib = np.triu_indices(len(vecs), k=1)
    truth = {
        (int(a), int(b))
        for a, b in zip(ia[cos[ia, ib] >= 0.95], ib[cos[ia, ib] >= 0.95])
    }
    assert len(truth) >= 50  # the plant worked

    emb = spark.createDataFrame(
        [(int(i), [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    got = {
        (r.vec_id_a, r.vec_id_b)
        for r in embedding_near_dup(
            emb, threshold=0.95, corpus_size=len(vecs)
        ).collect()
    }
    assert got <= truth  # no false positives (exact verify)
    recall = len(got & truth) / len(truth)
    # 4-band sign-LSH at planes=8, cos>=0.95: analytic per-band collision
    # ~0.9^8=0.43, 4 bands -> ~0.90 expected; gate leaves contention room
    assert recall >= 0.7, f"banded near-dup recall {recall:.2f}"


def test_connected_components_vs_union_find(spark):
    """Hash-min label propagation equals a python union-find on a graph
    with chains, cliques, singletons, and two merged stars."""
    edges = [
        (1, 2), (2, 3), (3, 4),          # chain
        (10, 11), (10, 12), (11, 12),    # triangle
        (20, 21), (22, 21), (23, 24), (24, 21),  # merged stars
    ]
    nodes = list(range(1, 5)) + [7, 8] + list(range(10, 13)) + list(range(20, 25))
    from lucene_solr_spark.textops.dedup import connected_components

    e = spark.createDataFrame(edges, "docid_a long, docid_b long")
    n = spark.createDataFrame([(x,) for x in nodes], "docid long")
    got = {
        r.docid: r.component
        for r in connected_components(e, nodes=n).collect()
    }

    parent = {x: x for x in nodes}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {x: find(x) for x in nodes}
    assert got == want
    assert got[7] == 7 and got[8] == 8  # singletons survive


def test_near_dup_components_survivors(spark, docs):
    """Cluster formation over the LSH pair graph: exactly one survivor per
    component (the min docid), every doc labeled."""
    from lucene_solr_spark.textops.dedup import (
        near_dup_components,
        near_dup_pairs,
    )

    out = near_dup_components(docs, threshold=0.8).collect()
    n_docs = docs.count()
    assert len(out) == n_docs
    by_comp: dict[int, list] = {}
    for r in out:
        by_comp.setdefault(r.component, []).append(r)
    for comp, members in by_comp.items():
        keepers = [m for m in members if m.keep]
        assert len(keepers) == 1
        assert keepers[0].docid == comp == min(m.docid for m in members)
    # consistency with the pair graph: endpoints of every pair share a comp
    comp_of = {r.docid: r.component for r in out}
    for p in near_dup_pairs(docs, threshold=0.8).collect():
        assert comp_of[p.docid_a] == comp_of[p.docid_b]

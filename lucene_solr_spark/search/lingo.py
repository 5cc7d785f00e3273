"""Lingo — the second Carrot2 clustering algorithm the reference ships,
as a deterministic page-bounded analog (description-comes-first clustering).

Reference surface: solr/contrib/clustering/src/java/org/apache/solr/handler/
clustering/carrot2/CarrotClusteringEngine.java:95-210 with
org.carrot2.clustering.lingo.LingoClusteringAlgorithm as the default engine
(solrconfig's carrot.algorithm).  The algorithm itself is published:
Osiński, Stefanowski & Weiss, "Lingo: Search Results Clustering Algorithm
Based on Singular Value Decomposition" (IIPWM 2004):

  1. term-document matrix A over the result window (stopword-pruned terms
     occurring in >= 2 docs), tf-idf weighted, columns length-normalized;
  2. SVD of A; keep the first k left singular vectors U_k, k chosen as the
     smallest k whose singular values explain >= q of the Frobenius norm
     (the paper's candidate-label quality threshold, default q=0.775 in
     Carrot2);
  3. label induction: candidate labels = frequent phrases (the suffix-tree
     base clusters STC finds, reused from search/stc.py) plus frequent
     single terms; each abstract concept u_i picks the candidate whose
     unit term-space vector has max |cosine| to it — that cosine is the
     cluster's score;
  4. cluster assignment (VSM step): every window document joins each label
     whose cosine(doc, label) exceeds the assignment threshold; documents
     matching no label fall into "Other Topics".

Determinism: numpy's LAPACK SVD is deterministic for a fixed matrix; sign
ambiguity of singular vectors is irrelevant because step 3 uses |cosine|.
Term order, phrase candidates, and all tie-breaks are lexicographic.

Scale shape: identical to STC/the reference — everything past the BM25
top-k and the window-text semi-join runs driver-side on a <= rows × terms
matrix (rows <= 30-50, terms a few hundred); corpus size never enters.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame

from lucene_solr_spark.analysis.analyzer import _STOP_SET
from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.stc import _sentences, stc_base_clusters


def _tfidf_matrix(doc_sents: dict):
    """Term-document tf-idf matrix over stopword-pruned terms in >=2 docs.

    Returns (terms sorted, docids sorted, A [terms x docs] column-normalized).
    """
    docids = sorted(doc_sents)
    tf: dict[tuple, int] = {}
    df: dict[str, int] = {}
    for d in docids:
        seen = set()
        for s in doc_sents[d]:
            for t in s:
                if t in _STOP_SET:
                    continue
                tf[(t, d)] = tf.get((t, d), 0) + 1
                seen.add(t)
        for t in seen:
            df[t] = df.get(t, 0) + 1
    terms = sorted(t for t, n in df.items() if n >= 2)
    if not terms or len(docids) < 2:
        return terms, docids, np.zeros((len(terms), len(docids)))
    n = len(docids)
    ti = {t: i for i, t in enumerate(terms)}
    A = np.zeros((len(terms), n))
    for (t, d), f in tf.items():
        if t in ti:
            A[ti[t], docids.index(d)] = f * math.log(n / df[t]) if df[t] < n else f
    norms = np.linalg.norm(A, axis=0)
    norms[norms == 0] = 1.0
    return terms, docids, A / norms


def _label_vector(phrase: tuple, terms: list, ti: dict) -> np.ndarray | None:
    """Unit term-space vector of a candidate label (paper §3, phrase
    vectors are the normalized sum of member term unit vectors)."""
    v = np.zeros(len(terms))
    hit = False
    for t in phrase:
        if t in ti:
            v[ti[t]] += 1.0
            hit = True
    if not hit:
        return None
    return v / np.linalg.norm(v)


def lingo(
    doc_texts: list,
    quality_threshold: float = 0.775,
    assignment_threshold: float = 0.15,
    max_clusters: int = 15,
    other_topics: bool = True,
) -> list[dict]:
    """Full Lingo over ``[(docid, text), ...]`` (the result window).

    Returns [{label, size, docids, score}, ...] ordered (score desc,
    label asc); unassigned docs in a trailing "Other Topics" row.
    """
    doc_sents = {d: _sentences(t) for d, t in doc_texts}
    terms, docids, A = _tfidf_matrix(doc_sents)
    if not terms or A.shape[1] < 2 or not A.any():
        rest = sorted(d for d, _ in doc_texts)
        return (
            [{"label": "Other Topics", "size": len(rest), "docids": rest,
              "score": 0.0}]
            if other_topics and rest else []
        )
    ti = {t: i for i, t in enumerate(terms)}

    U, s, _ = np.linalg.svd(A, full_matrices=False)
    total = float(np.sum(s**2)) or 1.0
    k = 1
    while k < len(s) and float(np.sum(s[:k] ** 2)) / total < quality_threshold:
        k += 1
    k = min(k, max_clusters)

    # candidate labels: frequent phrases (suffix-tree nodes) + single terms
    cands: list[tuple] = [b.phrase for b in stc_base_clusters(
        doc_sents, min_base_score=0.0
    )]
    cands += [(t,) for t in terms]
    cand_vecs = []
    for p in sorted(set(cands)):
        v = _label_vector(p, terms, ti)
        if v is not None:
            cand_vecs.append((p, v))

    clusters: dict[str, dict] = {}
    for i in range(k):
        u = U[:, i]
        best, best_cos = None, -1.0
        for p, v in cand_vecs:
            c = abs(float(np.dot(u, v)))
            # strict > keeps the lexicographically-first candidate on ties
            if c > best_cos + 1e-12:
                best, best_cos = p, c
        if best is None:
            continue
        label = " ".join(best)
        lv = dict(cand_vecs)[best]
        cos_docs = lv @ A  # cosine: both sides unit-normalized
        members = [docids[j] for j in range(len(docids))
                   if cos_docs[j] > assignment_threshold]
        if not members:
            continue
        prev = clusters.get(label)
        if prev is None or best_cos > prev["score"]:
            clusters[label] = {
                "label": label, "size": len(members),
                "docids": sorted(members), "score": round(best_cos, 6),
            }

    out = sorted(clusters.values(), key=lambda c: (-c["score"], c["label"]))
    out = out[:max_clusters]
    if other_topics:
        covered: set = set()
        for c in out:
            covered.update(c["docids"])
        rest = sorted(d for d, _ in doc_texts if d not in covered)
        if rest:
            out.append({"label": "Other Topics", "size": len(rest),
                        "docids": rest, "score": 0.0})
    return out


def cluster_results_lingo(
    index: IndexTables,
    text_source: DataFrame,
    query_terms: list[str],
    rows: int = 30,
    id_col: str = "docid",
    text_col: str = "text",
    **params,
) -> DataFrame:
    """Cluster the top-``rows`` BM25 results of an OR query with Lingo.
    Same contract as search/stc.py cluster_results_stc."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.bm25 import search
    from lucene_solr_spark.search.query import BooleanQuery

    window = search(index, BooleanQuery.of(should=query_terms), k=rows).select(
        "docid"
    )
    page = (
        text_source.select(
            F.col(id_col).cast("long").alias("docid"), F.col(text_col).alias("text")
        )
        .join(window, "docid")
        .collect()
    )
    clusters = lingo([(r["docid"], r["text"]) for r in page], **params)
    spark = text_source.sparkSession
    schema = "label string, size long, docids array<long>, score double"
    return spark.createDataFrame(
        [(c["label"], c["size"], c["docids"], c["score"]) for c in clusters], schema
    )

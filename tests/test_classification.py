"""Classification: differential tests vs literal per-token pure-Python
oracles of SimpleNaiveBayesClassifier.java:137-213 and
KNearestNeighborClassifier.java:81-121 (reference iteration order: classes
from the sorted term dictionary, per-occurrence double additions)."""

import math
from collections import Counter

import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.classification import knn_classify, naive_bayes_classify
from lucene_solr_spark.index.builder import build_index


@pytest.fixture(scope="module")
def corpus(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang").collect()
    )
    return [(r.doc_id, r.text, r.lang) for r in rows]


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, passthrough_cols=("lang",),
    )


class NBOracle:
    """Literal assignClass: per-token loop, add-1 smoothing, strict-> argmax
    over classes in ascending order (termsEnum order)."""

    def __init__(self, corpus):
        self.toks = {d: analyze_text(t) for d, t, _ in corpus}
        self.cls = {d: c for d, t, c in corpus}
        self.classes = sorted({c for _, _, c in corpus if c is not None})
        self.nc = Counter(c for _, _, c in corpus if c is not None)
        self.dwc = sum(self.nc.values())
        # hits(w, c): docs of class c containing w
        self.wc = Counter()
        docs_with_terms = 0
        pairs = 0
        for d, t, c in corpus:
            uniq = set(self.toks[d])
            if uniq:
                docs_with_terms += 1
            pairs += len(uniq)
            for w in uniq:
                self.wc[(w, c)] += 1
        self.avg_unique = pairs / docs_with_terms

    def assign(self, docid):
        best, best_v = None, None
        for c in self.classes:  # ascending = termsEnum order
            v = math.log(self.nc[c]) - math.log(self.dwc)
            den = self.avg_unique * self.nc[c] + self.dwc
            for w in self.toks[docid]:  # per-occurrence, in token order
                v += math.log((self.wc.get((w, c), 0) + 1) / den)
            if best_v is None or v > best_v:  # strict > keeps first class
                best, best_v = c, v
        return best, 10.0 / abs(best_v)


def test_naive_bayes_matches_literal_oracle(index, corpus):
    got = {
        r.docid: (r.assigned_class, r.score)
        for r in naive_bayes_classify(index, "lang", max_docid=40).collect()
    }
    oracle = NBOracle(corpus)
    checked = 0
    for d, t, _ in corpus:
        if d > 40 or not oracle.toks[d]:
            continue
        cls, score = oracle.assign(d)
        assert got[d][0] == cls, f"doc {d}: {got[d][0]} != {cls}"
        # engine rounds to 4dp; regrouping noise is sub-ulp relative
        assert abs(got[d][1] - score) < 1.1e-4, f"doc {d}"
        checked += 1
    assert checked >= 30


def test_naive_bayes_deterministic_and_valid(index, corpus):
    """Assignments are drawn from the observed class set, scores positive,
    and a rerun is bit-identical (argmax ties are pinned class-asc)."""
    a = naive_bayes_classify(index, "lang", max_docid=100).collect()
    b = naive_bayes_classify(index, "lang", max_docid=100).collect()
    assert a == b
    classes = {c for _, _, c in corpus if c is not None}
    assert all(r.assigned_class in classes and r.score > 0 for r in a)
    assert [r.docid for r in a] == sorted(r.docid for r in a)


def _knn_reference_vote(index, docid, k, max_query_terms):
    """Recompute the kNN vote from first principles: MLT term gate (tf*idf,
    ties term-asc), BM25 OR sum over those terms (self INCLUDED, java
    :85-94), top-k by (score desc, docid asc), majority class with
    class-asc ties."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.search.bm25 import term_scores

    rows = (
        index.postings.filter(F.col("docid") == docid)
        .join(index.term_stats(), "term").select("term", "tf", "df").collect()
    )
    n = index.max_doc
    gated = sorted(
        (-r.tf * math.log(1.0 + (n - r.df + 0.5) / (r.df + 0.5)), r.term)
        for r in rows
    )
    terms = [t for _, t in gated[:max_query_terms]]
    scored = term_scores(index, terms).collect()
    per_doc: dict[int, list] = {}
    for r in scored:
        per_doc.setdefault(r.docid, []).append((r.term, r.score))
    hits = []
    for d, ts in per_doc.items():
        s = 0.0
        for _, sc in sorted(ts):
            s += sc
        hits.append((d, round(s, 4)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    top = hits[:k]
    langs = {
        r.docid: r.lang for r in index.docs.select("docid", "lang").collect()
    }
    votes = Counter(langs[d] for d, _ in top)
    best = sorted(votes.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    return best[0], best[1] / k, {d for d, _ in top}


@pytest.mark.parametrize("docid,k", [(0, 10), (7, 5), (42, 10)])
def test_knn_matches_reference_vote(index, docid, k):
    out = knn_classify(index, docid=docid, class_col="lang", k=k).collect()
    assert len(out) == 1
    row = out[0]
    cls, score, top = _knn_reference_vote(index, docid, k, max_query_terms=3)
    assert row.assigned_class == cls
    assert row.score == round(score, 4)
    assert row.docid == docid
    # the source doc matches its own MLT terms, so it is a candidate
    assert docid in top or len(top) == k

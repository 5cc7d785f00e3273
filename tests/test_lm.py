"""LM similarities: differential test vs a pure-Python float32 oracle that
mirrors Lucene 4.10's SimilarityBase pipeline cast-for-cast
(LMDirichletSimilarity.java:65-69, LMJelinekMercerSimilarity.java:53-58,
LMSimilarity.java:153-154, SimilarityBase.java NORM_TABLE decode)."""

import math
from collections import Counter

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.lm import lm_dirichlet_topk, lm_jelinek_mercer_topk
from lucene_solr_spark.search.query import BooleanQuery
from lucene_solr_spark.smallfloat import byte315_to_float, encode_norm


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


class LMOracle:
    """float32 pipeline like the Java: p(t|C) is a float division
    (LMSimilarity.java:154 `+1F`), docLen is the NORM_TABLE decode
    1/(f*f), the two-log sum is double then cast to float."""

    def __init__(self, rows):
        self.tf: dict[int, Counter] = {}
        self.doclen: dict[int, np.float32] = {}
        self.cf: Counter = Counter()
        total = 0
        for docid, text in rows:
            toks = analyze_text(text)
            self.tf[docid] = Counter(toks)
            nb = int(encode_norm(len(toks))[0])
            f = np.float32(np.ravel(byte315_to_float(nb))[0])
            self.doclen[docid] = np.float32(1.0) / np.float32(f * f)
            for t in toks:
                self.cf[t] += 1
            total += len(toks)
        self.field_tokens = total

    def p(self, term) -> np.float32:
        return np.float32(
            np.float32(self.cf.get(term, 0) + 1.0)
            / np.float32(self.field_tokens + 1.0)
        )

    def dirichlet_topk(self, terms, mu=2000.0, k=10):
        hits = []
        for docid, c in self.tf.items():
            matched = [t for t in terms if c.get(t, 0) > 0]
            if not matched:
                continue
            s = np.float32(0.0)
            for t in matched:
                v = np.float32(
                    math.log(1.0 + c[t] / (mu * float(self.p(t))))
                    + math.log(mu / (float(self.doclen[docid]) + mu))
                )
                if v > 0:
                    s = np.float32(s + v)
            hits.append((docid, float(s)))
        hits.sort(key=lambda x: (-round(x[1], 4), x[0]))
        return hits[:k]

    def jm_topk(self, terms, lam=0.7, k=10):
        hits = []
        for docid, c in self.tf.items():
            matched = [t for t in terms if c.get(t, 0) > 0]
            if not matched:
                continue
            s = np.float32(0.0)
            for t in matched:
                v = np.float32(
                    math.log(
                        1.0
                        + ((1.0 - lam) * c[t] / float(self.doclen[docid]))
                        / (lam * float(self.p(t)))
                    )
                )
                s = np.float32(s + v)
            hits.append((docid, float(s)))
        hits.sort(key=lambda x: (-round(x[1], 4), x[0]))
        return hits[:k]


@pytest.fixture(scope="module")
def oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return LMOracle([(r.doc_id, r.text) for r in rows])


@pytest.mark.parametrize(
    "terms",
    [["vector", "stream", "hash"], ["table"], ["table", "merge", "scan"]],
)
def test_dirichlet_rank_identity(index, oracle, terms):
    got = [
        r.docid
        for r in lm_dirichlet_topk(
            index, BooleanQuery.of(should=terms), k=10
        ).collect()
    ]
    want = [d for d, _ in oracle.dirichlet_topk(terms, k=10)]
    assert got == want


@pytest.mark.parametrize("terms", [["table", "merge"], ["vector"]])
def test_jm_rank_identity(index, oracle, terms):
    got = [
        r.docid
        for r in lm_jelinek_mercer_topk(
            index, BooleanQuery.of(should=terms), k=10
        ).collect()
    ]
    want = [d for d, _ in oracle.jm_topk(terms, k=10)]
    assert got == want


def test_dirichlet_clips_negative_terms(index, oracle):
    # very common term in a long doc -> ln(mu/(dl+mu)) dominates and the
    # per-term score goes negative; the clip keeps the doc at 0, never below
    common = max(oracle.cf.items(), key=lambda kv: (kv[1], kv[0]))[0]
    rows = lm_dirichlet_topk(
        index, BooleanQuery.of(should=[common]), k=1000, round_dp=6
    ).collect()
    assert rows, f"common term {common!r} expected to match"
    assert all(r.score >= 0.0 for r in rows)


def test_dirichlet_must_and_not(index):
    q = BooleanQuery.of(must=["table", "merge"], must_not=["slow"])
    rows = lm_dirichlet_topk(index, q, k=50).collect()
    assert rows
    # verify filter semantics against raw postings
    import pyspark.sql.functions as F

    has = {
        t: {r.docid for r in index.postings.filter(F.col("term") == t)
            .select("docid").collect()}
        for t in ("table", "merge", "slow")
    }
    for r in rows:
        assert r.docid in has["table"] and r.docid in has["merge"]
        assert r.docid not in has["slow"]

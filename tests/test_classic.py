"""ClassicSimilarity (TFIDF): differential test vs a pure-Python float32
oracle that mirrors Lucene 4.10's DefaultSimilarity cast-for-cast
(DefaultSimilarity.java:61-139, TFIDFSimilarity.java:741-764)."""

import math
from collections import Counter

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.classic import classic_topk
from lucene_solr_spark.search.query import BooleanQuery, TermQuery
from lucene_solr_spark.smallfloat import byte315_to_float, encode_norm


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


class ClassicOracle:
    """float32 pipeline: tf/idf/queryNorm/norm/coord all cast like the Java."""

    def __init__(self, rows):
        self.tf: dict[int, Counter] = {}
        self.norm: dict[int, np.float32] = {}
        self.df: Counter = Counter()
        for docid, text in rows:
            toks = analyze_text(text)
            self.tf[docid] = Counter(toks)
            nb = int(encode_norm(len(toks))[0])
            # decodeNormValue = NORM_TABLE[b] = byte315ToFloat(b)
            self.norm[docid] = np.float32(np.ravel(byte315_to_float(nb))[0])
            for t in set(toks):
                self.df[t] += 1
        self.max_doc = len(rows)

    def idf(self, term) -> np.float32:
        return np.float32(
            math.log(self.max_doc / (self.df.get(term, 0) + 1.0)) + 1.0
        )

    def topk(self, must=(), should=(), mm=0, boosts=None, k=10):
        boosts = boosts or {}
        terms = list(dict.fromkeys([*must, *should]))
        idf = {t: self.idf(t) for t in terms}
        ssw = np.float32(0.0)
        for t in terms:
            qw = np.float32(idf[t] * np.float32(boosts.get(t, 1.0)))
            ssw = np.float32(ssw + np.float32(qw * qw))
        qn = np.float32(1.0 / math.sqrt(float(ssw)))
        # value = (idf*boost*queryNorm) * idf, all float32
        value = {
            t: np.float32(
                np.float32(idf[t] * np.float32(boosts.get(t, 1.0)) * qn) * idf[t]
            )
            for t in terms
        }
        max_overlap = len(must) + len(should)
        hits = []
        for docid, c in self.tf.items():
            if any(c.get(t, 0) == 0 for t in must):
                continue
            matched = [t for t in terms if c.get(t, 0) > 0]
            if not matched:
                continue
            if should and mm > 0 and sum(1 for t in should if c.get(t, 0)) < mm:
                continue
            s = np.float32(0.0)
            for t in matched:
                tfv = np.float32(math.sqrt(c[t]))
                s = np.float32(s + np.float32(tfv * value[t] * self.norm[docid]))
            if max_overlap > 1:
                s = np.float32(s * np.float32(len(matched) / float(max_overlap)))
            hits.append((docid, float(s)))
        # engine ordering discipline: round(score, 4) before ordering,
        # docid-ascending tie-break (HitQueue.java:76-81 analog) — sub-ulp
        # float32-vs-float64 differences must not flip ranks
        hits.sort(key=lambda x: (-round(x[1], 4), x[0]))
        return hits[:k]


@pytest.fixture(scope="module")
def oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return ClassicOracle([(int(r.doc_id), r.text) for r in rows])


def _compare(got_df, want, k):
    got = [(int(r.docid), float(r.score)) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in want[:k]], (got, want[:k])
    for (gd, gs), (wd, ws) in zip(got, want[:k]):
        # engine is the float64 analytical surface; oracle is float32
        assert abs(gs - ws) < 5e-4 * max(1.0, abs(ws)), (gd, gs, ws)


def test_classic_single_term(index, oracle):
    q = BooleanQuery.of(must=["table"])
    _compare(classic_topk(index, q, k=10), oracle.topk(must=["table"]), 10)


def test_classic_coord_disjunction(index, oracle):
    q = BooleanQuery.of(should=["vector", "stream", "hash"])
    _compare(
        classic_topk(index, q, k=10),
        oracle.topk(should=["vector", "stream", "hash"]),
        10,
    )


def test_classic_must_plus_should(index, oracle):
    q = BooleanQuery.of(must=["table"], should=["merge"])
    _compare(
        classic_topk(index, q, k=10),
        oracle.topk(must=["table"], should=["merge"]),
        10,
    )


def test_classic_mm(index, oracle):
    q = BooleanQuery.of(should=["vector", "stream", "hash"], mm=2)
    _compare(
        classic_topk(index, q, k=10),
        oracle.topk(should=["vector", "stream", "hash"], mm=2),
        10,
    )


def test_classic_boost(index, oracle):
    q = BooleanQuery(
        must=(TermQuery("table", boost=2.0),), should=(TermQuery("merge"),)
    )
    _compare(
        classic_topk(index, q, k=10),
        oracle.topk(must=["table"], should=["merge"], boosts={"table": 2.0}),
        10,
    )


def test_classic_must_not(index, oracle):
    q = BooleanQuery.of(must=["table"], must_not=["slow"])
    want = [
        (d, s)
        for d, s in oracle.topk(must=["table"], k=10**9)
        if "slow" not in oracle.tf[d] or oracle.tf[d]["slow"] == 0
    ]
    _compare(classic_topk(index, q, k=10), want, 10)

"""SweetSpotSimilarity: differential test vs a pure-Python float32 oracle
that mirrors the reference cast-for-cast (lucene/misc SweetSpotSimilarity:
computeLengthNorm :136-155, baselineTf :169-186, hyperbolicTf :188-225;
everything else DefaultSimilarity)."""

import math
from collections import Counter

import numpy as np
import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.query import BooleanQuery, TermQuery
from lucene_solr_spark.search.sweetspot import sweetspot_topk
from lucene_solr_spark.smallfloat import (
    byte315_to_float,
    encode_norm,
    sweetspot_encode_norm,
    sweetspot_length_norm,
    sweetspot_norm_ranges,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


def test_defaults_degrade_to_classic_norm():
    """(min=1, max=1, steepness=0.5) is documented to degrade to 1/sqrt(x)
    (SweetSpotSimilarity.java:127-130) — byte-identical to encode_norm."""
    for dl in [1, 2, 3, 7, 10, 99, 1000, 123456]:
        assert int(sweetspot_encode_norm(dl)[0]) == int(encode_norm(dl)[0]), dl


def test_plateau_is_exactly_one():
    assert np.all(sweetspot_length_norm([3, 4, 5, 6], 3, 6, 0.5) == np.float32(1.0))


def test_norm_ranges_cover_and_match_pointwise():
    r = sweetspot_norm_ranges(3, 20, 0.5, max_dl=1 << 20)
    prev = -1
    for lo, hi, _ in r:
        assert lo == prev + 1
        prev = hi
    assert prev == 1 << 20
    for dl in list(range(0, 300)) + [511, 4097, 65537]:
        b = int(sweetspot_encode_norm(dl, 3, 20, 0.5)[0])
        want = float(np.ravel(byte315_to_float(b))[0])
        got = next(v for lo, hi, v in r if lo <= dl <= hi)
        assert got == want, dl


def _baseline_tf_f32(freq: int, base: float, mn: float) -> np.float32:
    if freq == 0:
        return np.float32(0.0)
    if freq <= mn:
        return np.float32(base)
    # float32 inner arithmetic, double sqrt, float cast (java :180-186)
    inner = np.float32(
        np.float32(freq) + np.float32(np.float32(base) * np.float32(base)) - np.float32(mn)
    )
    return np.float32(math.sqrt(float(inner)))


def _hyperbolic_tf_f32(
    freq: int, mn: float, mx: float, base: float, xoffset: float
) -> np.float32:
    if freq == 0:
        return np.float32(0.0)
    x = float(np.float32(freq) - np.float32(xoffset))
    tanh = (base**x - base**-x) / (base**x + base**-x)
    return np.float32(np.float32(mn) + np.float32((mx - mn) / 2.0 * (tanh + 1.0)))


def test_hyperbolic_midpoint_and_limits():
    # at freq == xoffset the tanh is 0 -> (min+max)/2; far right -> max
    assert _hyperbolic_tf_f32(10, 0.0, 2.0, 1.3, 10.0) == np.float32(1.0)
    assert abs(float(_hyperbolic_tf_f32(100, 0.0, 2.0, 1.3, 10.0)) - 2.0) < 1e-6


class SweetSpotOracle:
    """float32 pipeline mirroring DefaultSimilarity folds with SweetSpot's
    tf and plateau norm substituted."""

    def __init__(self, rows, ln_min, ln_max, steepness, tf_fn):
        self.tf: dict[int, Counter] = {}
        self.norm: dict[int, np.float32] = {}
        self.df: Counter = Counter()
        self.tf_fn = tf_fn
        for docid, text in rows:
            toks = analyze_text(text)
            self.tf[docid] = Counter(toks)
            nb = int(sweetspot_encode_norm(len(toks), ln_min, ln_max, steepness)[0])
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
                tfv = self.tf_fn(c[t])
                s = np.float32(s + np.float32(tfv * value[t] * self.norm[docid]))
            if max_overlap > 1:
                s = np.float32(s * np.float32(len(matched) / float(max_overlap)))
            hits.append((docid, float(s)))
        hits.sort(key=lambda x: (-round(x[1], 4), x[0]))
        return hits[:k]


@pytest.fixture(scope="module")
def doc_rows(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return [(int(r.doc_id), r.text) for r in rows]


def _compare(got_df, want, k):
    got = [(int(r.docid), float(r.score)) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in want[:k]], (got, want[:k])
    for (gd, gs), (wd, ws) in zip(got, want[:k]):
        assert abs(gs - ws) < 5e-4 * max(1.0, abs(ws)), (gd, gs, ws)


def test_sweetspot_baseline_plateau(index, doc_rows):
    oracle = SweetSpotOracle(
        doc_rows, 3, 20, 0.5, lambda f: _baseline_tf_f32(f, 0.0, 0.0)
    )
    q = BooleanQuery.of(should=["vector", "stream", "hash"])
    _compare(
        sweetspot_topk(index, q, k=10, ln_min=3, ln_max=20, steepness=0.5),
        oracle.topk(should=["vector", "stream", "hash"]),
        10,
    )


def test_sweetspot_baseline_tf_floor(index, doc_rows):
    oracle = SweetSpotOracle(
        doc_rows, 3, 20, 0.5, lambda f: _baseline_tf_f32(f, 1.5, 2.0)
    )
    q = BooleanQuery.of(must=["table"], should=["merge"])
    _compare(
        sweetspot_topk(
            index, q, k=10, ln_min=3, ln_max=20, steepness=0.5,
            tf_base=1.5, tf_min=2.0,
        ),
        oracle.topk(must=["table"], should=["merge"]),
        10,
    )


def test_sweetspot_hyperbolic(index, doc_rows):
    oracle = SweetSpotOracle(
        doc_rows, 2, 10, 0.5,
        lambda f: _hyperbolic_tf_f32(f, 0.0, 2.0, 1.3, 10.0),
    )
    q = BooleanQuery.of(should=["vector", "stream", "hash"])
    _compare(
        sweetspot_topk(
            index, q, k=10, ln_min=2, ln_max=10, steepness=0.5,
            tf_mode="hyperbolic",
        ),
        oracle.topk(should=["vector", "stream", "hash"]),
        10,
    )


def test_sweetspot_boost_and_mm(index, doc_rows):
    oracle = SweetSpotOracle(
        doc_rows, 3, 20, 0.5, lambda f: _baseline_tf_f32(f, 0.0, 0.0)
    )
    q = BooleanQuery(
        must=(TermQuery("table", boost=2.0),),
        should=(TermQuery("merge"), TermQuery("vector")),
        minimum_should_match=1,
    )
    _compare(
        sweetspot_topk(index, q, k=10, ln_min=3, ln_max=20, steepness=0.5),
        oracle.topk(
            must=["table"], should=["merge", "vector"], mm=1,
            boosts={"table": 2.0},
        ),
        10,
    )

"""CommonTermsQuery: differential test vs a pure-Python oracle implementing
the reference's rewrite/buildQuery classification and match semantics
(lucene/queries CommonTermsQuery.java :150-235), scored under the engine's
BM25 sum discipline."""

import math

import numpy as np
import pytest

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.commonterms import (
    common_terms_topk,
    is_high_freq,
    min_nr_should_match,
)
from tests.oracle_py import OracleIndex


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


@pytest.fixture(scope="module")
def oracle(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    return OracleIndex([(int(r.doc_id), r.text) for r in rows])


def test_classification_condition():
    # absolute threshold: mtf >= 1 means df > mtf (but the ceil branch ORs in)
    assert is_high_freq(5, 4.0, 100)
    assert not is_high_freq(0, 0.001, 100)  # null TermContext -> low
    # ratio: df > ceil(f32(mtf) * f32(maxDoc))
    assert not is_high_freq(13, 0.125, 100)  # ceil(12.5) = 13, not >
    assert is_high_freq(14, 0.125, 100)


def test_min_nr_should_match_rounding():
    assert min_nr_should_match(0.0, 7) == 0
    assert min_nr_should_match(2.0, 7) == 2
    # Math.round(0.5f * 3) = round(1.5) = 2 (floor(x+0.5))
    assert min_nr_should_match(0.5, 3) == 2


def common_terms_oracle(
    oracle: OracleIndex,
    terms,
    mtf,
    low_occur="should",
    high_occur="should",
    low_mm=0.0,
    high_mm=0.0,
    k=10,
):
    terms = list(dict.fromkeys(terms))
    n = oracle.max_doc
    high = [t for t in terms if is_high_freq(oracle.df.get(t, 0), mtf, n)]
    low = [t for t in terms if t not in high]
    out = []
    for d in oracle.docids:
        scores = {t: oracle.term_score(d, t) for t in terms}
        lm = sum(scores[t] is not None for t in low)
        hm = sum(scores[t] is not None for t in high)

        def fold(sub):
            s = 0.0
            for t in terms:
                if t in sub and scores[t] is not None:
                    s = s + scores[t]
            return s

        if not low:
            if high_occur == "must":
                ok = hm == len(high)
            else:
                mmv = min_nr_should_match(high_mm, len(high))
                ok = hm == len(high) if mmv == 0 else hm >= mmv
            if not ok:
                continue
            s = fold(high)
        elif not high:
            if low_occur == "must":
                ok = lm == len(low)
            else:
                ok = lm >= max(min_nr_should_match(low_mm, len(low)), 1)
            if not ok:
                continue
            s = fold(low)
        else:
            if low_occur == "must":
                ok = lm == len(low)
            else:
                ok = lm >= max(min_nr_should_match(low_mm, len(low)), 1)
            if not ok:
                continue
            if high_occur == "must":
                hok = hm == len(high)
            else:
                hok = hm >= max(min_nr_should_match(high_mm, len(high)), 1)
            s = fold(low) + (fold(high) if hok else 0.0)
        out.append((d, s))
    out.sort(key=lambda x: (-round(x[1], 4), x[0]))
    return out[:k]


def _compare(got_df, want, k):
    got = [(int(r.docid), float(r.score)) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in want[:k]], (got, want[:k])
    for (gd, gs), (wd, ws) in zip(got, want[:k]):
        assert abs(gs - ws) < 1e-3 * max(1.0, abs(ws)), (gd, gs, ws)


def _pick_terms(oracle):
    """A mixed bag: two genuinely common terms and two rare ones at sf0.01."""
    by_df = sorted(oracle.df.items(), key=lambda kv: -kv[1])
    common = [t for t, _ in by_df[:2]]
    rare = [t for t, df in by_df if df >= 3][-2:]
    return common, rare


def test_common_terms_mixed(index, oracle):
    common, rare = _pick_terms(oracle)
    terms = [*rare, *common]
    mtf = 0.125
    got = common_terms_topk(index, terms, mtf, k=10)
    want = common_terms_oracle(oracle, terms, mtf, k=10)
    _compare(got, want, 10)


def test_common_terms_low_must(index, oracle):
    common, rare = _pick_terms(oracle)
    terms = [*rare, *common]
    got = common_terms_topk(index, terms, 0.125, low_freq_occur="must", k=10)
    want = common_terms_oracle(oracle, terms, 0.125, low_occur="must", k=10)
    _compare(got, want, 10)


def test_common_terms_all_high_conjunction(index, oracle):
    common, _ = _pick_terms(oracle)
    got = common_terms_topk(index, common, 0.125, k=10)
    want = common_terms_oracle(oracle, common, 0.125, k=10)
    _compare(got, want, 10)
    # rewrite semantics: every surviving doc has ALL the high terms
    for d, _s in want:
        assert all(oracle.tf[d].get(t) for t in common)


def test_common_terms_all_low(index, oracle):
    _, rare = _pick_terms(oracle)
    got = common_terms_topk(index, rare, 0.125, k=10)
    want = common_terms_oracle(oracle, rare, 0.125, k=10)
    _compare(got, want, 10)


def test_common_terms_high_must(index, oracle):
    common, rare = _pick_terms(oracle)
    terms = [*rare, *common]
    got = common_terms_topk(
        index, terms, 0.125, high_freq_occur="must", k=10
    )
    want = common_terms_oracle(oracle, terms, 0.125, high_occur="must", k=10)
    _compare(got, want, 10)


def test_common_terms_ratio_mm(index, oracle):
    common, rare = _pick_terms(oracle)
    terms = [*rare, *common]
    got = common_terms_topk(index, terms, 0.125, low_freq_mm=0.5, k=10)
    want = common_terms_oracle(oracle, terms, 0.125, low_mm=0.5, k=10)
    _compare(got, want, 10)

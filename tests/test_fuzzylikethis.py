"""FuzzyLikeThisQuery: differential vs a pure-Python mirror of
FuzzyLikeThisQuery.java:215-330 + SlowFuzzyTermsEnum.java:113-142 over the
live corpus dictionary."""

import math

import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.fuzzylikethis import fuzzy_like_this_topk
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


def _lev(a: str, b: str) -> int:
    if not a:
        return len(b)
    if not b:
        return len(a)
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _py_flt(oracle, query, ms, p, max_terms=50, max_var=50, k=10):
    terms = list(dict.fromkeys(analyze_text(query)))
    variants = []
    for s in terms:
        cands = []
        for t, dfv in oracle.df.items():
            if p > 0 and t[:p] != s[:p]:
                continue
            ssuf, csuf = s[p:], t[p:]
            if t == s:
                boost = 1.0
            else:
                denom = float(p) + min(len(ssuf), len(csuf))
                sim = 1.0 - _lev(ssuf, csuf) / denom
                if not sim > ms:
                    continue
                boost = (sim - ms) / (1.0 - ms)
            cands.append((t, boost, dfv))
        if not cands:
            continue
        avgdf = math.floor(sum(d for _, _, d in cands) * 1.0 / len(cands))
        srcdf = oracle.df.get(s, 0)
        dfu = avgdf if srcdf == 0 else srcdf
        cands.sort(key=lambda x: (-x[1], x[0]))
        for t, boost, _ in cands[:max_var]:
            vs = (boost * boost) * (
                math.log(oracle.max_doc / (dfu + 1.0)) + 1.0
            )
            variants.append((s, t, vs))
    variants.sort(key=lambda v: (-v[2], v[1], v[0]))
    variants = variants[:max_terms]
    idf1 = math.log(1.0 + (oracle.max_doc - 1.0 + 0.5) / (1.0 + 0.5))
    hits = []
    for docid, c in oracle.tf.items():
        contribs = []
        for _s, t, vs in variants:
            tf = c.get(t)
            if tf:
                dl = oracle.dl_approx[docid]
                contribs.append(
                    vs * (idf1 * 2.2 * tf
                          / (tf + 1.2 * (0.25 + 0.75 * dl / oracle.avgdl)))
                )
        if contribs:
            contribs.sort()
            s = 0.0
            for x in contribs:
                s = s + x
            hits.append((docid, round(s, 4)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[:k]


def _compare(got_df, want):
    got = [(int(r.docid), float(r.score)) for r in got_df.collect()]
    assert [d for d, _ in got] == [d for d, _ in want], (got, want)
    for (gd, gs), (_, ws) in zip(got, want):
        assert abs(gs - ws) < 1e-6 * max(1.0, abs(ws)), (gd, gs, ws)


def test_flt_misspelled_terms(index, oracle):
    got = fuzzy_like_this_topk(
        index, "tabel scann", min_similarity=0.5, prefix_length=1, k=10
    )
    want = _py_flt(oracle, "tabel scann", 0.5, 1)
    assert want, "oracle found no variants — corpus drifted?"
    _compare(got, want)


def test_flt_exact_term_gets_boost_one(index, oracle):
    got = fuzzy_like_this_topk(
        index, "table", min_similarity=0.6, prefix_length=2, k=10
    )
    want = _py_flt(oracle, "table", 0.6, 2)
    _compare(got, want)


def test_flt_variant_caps(index, oracle):
    got = fuzzy_like_this_topk(
        index, "tabel scann merge", min_similarity=0.5, prefix_length=0,
        max_num_terms=5, max_variants_per_term=3, k=10,
    )
    want = _py_flt(oracle, "tabel scann merge", 0.5, 0, max_terms=5, max_var=3)
    _compare(got, want)


def test_flt_ignore_tf(index, oracle):
    got = fuzzy_like_this_topk(
        index, "tabel", min_similarity=0.5, prefix_length=1,
        ignore_tf=True, k=10,
    )
    # ignoreTF: contribution is the variant score alone per matched variant
    terms = ["tabel"]
    want_variants = _py_flt(oracle, "tabel", 0.5, 1, k=10)
    assert len(got.collect()) > 0 and want_variants

"""LukeRequestHandler analog: top terms, df histogram slot logic, summary —
checked against a pure-Python walk of the same corpus."""

from collections import Counter

import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.luke import (
    luke_histogram,
    luke_index_summary,
    luke_top_terms,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


@pytest.fixture(scope="module")
def walk(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    df, cf, total = Counter(), Counter(), 0
    for r in rows:
        toks = analyze_text(r.text)
        total += len(toks)
        for t, n in Counter(toks).items():
            df[t] += 1
            cf[t] += n
    return df, cf, total, len(rows)


def _slot(df: int) -> int:
    # 32 - numberOfLeadingZeros(max(0, df-1)) == bit_length(df-1)
    return max(0, df - 1).bit_length()


def test_slot_logic_matches_java():
    # (df, expected slot) pairs from the Java formula
    for df, want in [(1, 0), (2, 1), (3, 2), (4, 2), (5, 3), (8, 3), (9, 4)]:
        assert _slot(df) == want, df


def test_luke_top_terms(index, walk):
    dfc, _, _, _ = walk
    got = [(r.term, int(r.df)) for r in luke_top_terms(index, k=10).collect()]
    want = sorted(dfc.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_luke_histogram(index, walk):
    dfc, _, _, _ = walk
    got = {int(r.bucket): int(r.n_terms) for r in luke_histogram(index).collect()}
    want = Counter(1 << _slot(d) for d in dfc.values())
    assert got == dict(want)


def test_luke_index_summary(index, walk):
    dfc, cfc, total, n = walk
    row = luke_index_summary(index).collect()[0]
    assert int(row.num_docs) == n
    assert int(row.distinct_terms) == len(dfc)
    assert int(row.total_term_freq) == total == sum(cfc.values())

"""TermsFilter / BooleanFilter / ChainedFilter: set-algebra differentials
vs Python sets built from the analyzed corpus."""

import pytest

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.filtercache import (
    boolean_filter,
    chained_filter,
    terms_filter,
)


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8,
    )


@pytest.fixture(scope="module")
def sets(spark, sf_dir):
    rows = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text").collect()
    )
    member: dict[str, set] = {}
    alldocs = set()
    for r in rows:
        d = int(r.doc_id)
        alldocs.add(d)
        for t in set(analyze_text(r.text)):
            member.setdefault(t, set()).add(d)
    return member, alldocs


def _ids(df):
    return {int(r.docid) for r in df.collect()}


def test_terms_filter(index, sets):
    member, _ = sets
    got = _ids(terms_filter(index, ["table", "merge"]))
    assert got == member["table"] | member["merge"]


def test_boolean_filter_should_not_must(index, sets):
    member, _ = sets
    got = _ids(
        boolean_filter(
            index,
            must=[terms_filter(index, ["scan"])],
            should=[terms_filter(index, ["table"]), terms_filter(index, ["merge"])],
            must_not=[terms_filter(index, ["slow"])],
        )
    )
    want = ((member["table"] | member["merge"]) - member["slow"]) & member["scan"]
    assert got == want


def test_boolean_filter_only_not_uses_universe(index, sets):
    member, alldocs = sets
    got = _ids(boolean_filter(index, must_not=[terms_filter(index, ["table"])]))
    assert got == alldocs - member["table"]


def test_chained_filter_and_or_andnot(index, sets):
    member, _ = sets
    chain = [
        terms_filter(index, ["table"]),
        terms_filter(index, ["merge"]),
        terms_filter(index, ["slow"]),
    ]
    got = _ids(chained_filter(index, chain, ["and", "or", "andnot"]))
    want = (member["table"] | member["merge"]) - member["slow"]
    assert got == want


def test_chained_filter_xor(index, sets):
    member, _ = sets
    chain = [terms_filter(index, ["table"]), terms_filter(index, ["merge"])]
    got = _ids(chained_filter(index, chain, "xor"))
    assert got == member["table"] ^ member["merge"]


def test_chained_filter_initial_andnot(index, sets):
    member, alldocs = sets
    chain = [terms_filter(index, ["table"]), terms_filter(index, ["merge"])]
    got = _ids(chained_filter(index, chain, ["andnot", "and"]))
    want = (alldocs - member["table"]) & member["merge"]
    assert got == want


def test_duplicate_filter(index, spark, sf_dir):
    from pyspark.sql import functions as F

    from lucene_solr_spark.search.filtercache import duplicate_filter

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vals = docs.select(
        F.col("doc_id").cast("long").alias("docid"),
        F.col("source").alias("keyval"),
    )
    rows = [(int(r.docid), r.keyval) for r in vals.collect()]
    first, last = {}, {}
    for d, v in sorted(rows):
        last[v] = d
        first.setdefault(v, d)
    got_last = _ids(duplicate_filter(vals, "last"))
    got_first = _ids(duplicate_filter(vals, "first"))
    assert got_last == set(last.values())
    assert got_first == set(first.values())

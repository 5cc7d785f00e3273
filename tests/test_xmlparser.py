"""CoreParser XML query surface: each supported node must execute
identically to the equivalent direct engine call."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.index.builder import build_index
from lucene_solr_spark.search.bm25 import (
    dismax,
    search,
    search_parsed,
    span_first_topk,
    span_near_topk,
)
from lucene_solr_spark.search.query import BooleanQuery, TermQuery
from lucene_solr_spark.search.xmlparser import xml_query_topk


@pytest.fixture(scope="module")
def index(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return build_index(
        spark, docs, key_col="doc_id", docid_col="doc_id",
        num_index_partitions=8, build_positions=True,
    )


def _rows(df):
    return [(int(r.docid), float(r.score)) for r in df.collect()]


def test_xml_term_query(index):
    got = xml_query_topk(index, "<TermQuery>table</TermQuery>", k=10)
    assert _rows(got) == _rows(search(index, "table", k=10))


def test_xml_boolean_query(index):
    xml = """<BooleanQuery minimumNumberShouldMatch="1">
      <Clause occurs="must"><TermQuery>table</TermQuery></Clause>
      <Clause occurs="should"><TermQuery>merge</TermQuery></Clause>
      <Clause occurs="should"><TermQuery boost="2.0">vector</TermQuery></Clause>
      <Clause occurs="mustNot"><TermQuery>slow</TermQuery></Clause>
    </BooleanQuery>"""
    q = BooleanQuery(
        (TermQuery("table"),),
        (TermQuery("merge"), TermQuery("vector", boost=2.0)),
        (TermQuery("slow"),),
        1,
    )
    assert _rows(xml_query_topk(index, xml, k=10)) == _rows(search(index, q, k=10))


def test_xml_dismax(index):
    xml = """<DisjunctionMaxQuery tieBreaker="0.3">
      <TermQuery>table</TermQuery><TermQuery>merge</TermQuery>
    </DisjunctionMaxQuery>"""
    assert _rows(xml_query_topk(index, xml, k=10)) == _rows(
        dismax(index, ["table", "merge"], tie=0.3, k=10)
    )


def test_xml_user_query(index):
    xml = "<UserQuery>table AND merge</UserQuery>"
    assert _rows(xml_query_topk(index, xml, k=10)) == _rows(
        search_parsed(index, "table AND merge", k=10)
    )


def test_xml_span_near_and_first(index):
    xml = """<SpanNear slopFactor="1" inOrder="true">
      <SpanTerm>table</SpanTerm><SpanTerm>scan</SpanTerm>
    </SpanNear>"""
    want = (
        span_near_topk(index, ["table", "scan"], slop=1, in_order=True)
        .orderBy(F.desc("score"), F.asc("docid")).limit(10)
    )
    assert _rows(xml_query_topk(index, xml, k=10)) == _rows(want)

    xml_first = '<SpanFirst end="10"><SpanTerm>table</SpanTerm></SpanFirst>'
    want_f = (
        span_first_topk(index, ["table"], end=10)
        .orderBy(F.desc("score"), F.asc("docid")).limit(10)
    )
    assert _rows(xml_query_topk(index, xml_first, k=10)) == _rows(want_f)


def test_xml_filtered_and_constant_score(index):
    xml = """<FilteredQuery>
      <TermQuery>table</TermQuery>
      <TermsFilter>merge</TermsFilter>
    </FilteredQuery>"""
    got = _rows(xml_query_topk(index, xml, k=10))
    # every hit must contain 'merge'; scores equal the plain term query's
    base = dict(_rows(search(index, "table", k=10**6)))
    from lucene_solr_spark.search.filtercache import terms_filter

    mset = {int(r.docid) for r in terms_filter(index, ["merge"]).collect()}
    assert got and all(d in mset and abs(s - base[d]) < 1e-9 for d, s in got)

    cs = _rows(
        xml_query_topk(
            index, '<ConstantScoreQuery boost="2.5"><TermsFilter>merge</TermsFilter></ConstantScoreQuery>', k=5
        )
    )
    assert cs and all(s == 2.5 for _, s in cs)


def test_xml_boost_attribute(index):
    plain = _rows(xml_query_topk(index, "<TermQuery>table</TermQuery>", k=5))
    boosted = _rows(
        xml_query_topk(index, '<TermQuery boost="3.0">table</TermQuery>', k=5)
    )
    for (d1, s1), (d2, s2) in zip(plain, boosted):
        assert d1 == d2 and abs(s2 - round(s1 * 3.0, 4)) < 1e-6


def test_xml_unknown_node_rejected(index):
    with pytest.raises(ValueError):
        xml_query_topk(index, "<WeirdQuery>x</WeirdQuery>")

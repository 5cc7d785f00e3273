"""XML query parser — the lucene/queryparser/xml CoreParser surface.

Reference semantics (public Apache Lucene 4.10.5 source, studied at
/root/reference/lucene/queryparser/src/java/org/apache/lucene/queryparser/
xml/CoreParser.java:60-130 and builders/): an XML document describes a query
tree; each element name maps to a registered builder.  Supported node set
here (the CoreParser registrations, executed through the engine's existing
paths):

- ``<TermQuery fieldName=..>term</TermQuery>`` (TermQueryBuilder)
- ``<TermsQuery>free text</TermsQuery>`` — analyzed into SHOULD terms
  (TermsQueryBuilder)
- ``<MatchAllDocsQuery/>``
- ``<BooleanQuery>`` with ``<Clause occurs="must|should|mustNot">``
  children wrapping TermQuery nodes (BooleanQueryBuilder; the engine's
  flat BooleanQuery clause model — nested boolean children raise)
- ``<DisjunctionMaxQuery tieBreaker=..>`` over TermQuery children
- ``<UserQuery>`` — the classic query-parser grammar
  (UserInputQueryBuilder)
- span family: ``<SpanTerm>``, ``<SpanOrTerms>``, ``<SpanNear
  slopFactor=.. inOrder=..>``, ``<SpanFirst end=..>``, ``<SpanNot>``
  (SpanQueryBuilderFactory tree)
- ``<ConstantScoreQuery>`` / ``<FilteredQuery>`` over a ``<TermsFilter>``
  (TermsFilterBuilder — the DocSet semi-join)

Out of scope (documented): BoostingTermQuery (needs a payload field — the
payload path exists separately in search/payloadquery), CachedFilter (the
FilterCache holds that role), NumericRange* (typed columns answer ranges
directly in this engine).

Scale shape: parsing is driver-side over the request string; execution
delegates to the already-audited frames — nothing new materializes.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lucene_solr_spark.analysis.analyzer import analyze_text
from lucene_solr_spark.index.builder import IndexTables
from lucene_solr_spark.search.query import BooleanQuery, TermQuery


def _text(el) -> str:
    return (el.text or "").strip()


def xml_query_topk(
    index: IndexTables, xml: str, k: int = 10, round_dp: int = 4
) -> DataFrame:
    """Parse and execute a CoreParser XML query against the index."""
    root = ET.fromstring(xml)
    return _execute(index, root, k, round_dp)


def _execute(index: IndexTables, el, k: int, round_dp: int) -> DataFrame:
    from lucene_solr_spark.search.bm25 import (
        dismax,
        search,
        search_parsed,
        span_first_topk,
        span_near_topk,
        span_not_topk,
        span_or_topk,
    )

    tag = el.tag
    boost = float(el.get("boost", "1.0"))

    def boosted(df: DataFrame) -> DataFrame:
        if boost == 1.0:
            return df
        return df.select(
            "docid", F.round(F.col("score") * F.lit(boost), round_dp).alias("score")
        ).orderBy(F.desc("score"), F.asc("docid"))

    if tag == "TermQuery":
        return boosted(search(index, _text(el).lower(), k=k, round_dp=round_dp))
    if tag == "TermsQuery":
        terms = list(dict.fromkeys(analyze_text(_text(el))))
        return boosted(
            search(index, BooleanQuery.of(should=terms), k=k, round_dp=round_dp)
        )
    if tag == "MatchAllDocsQuery":
        return index.docs.select(
            "docid", F.lit(1.0).alias("score")
        ).orderBy(F.asc("docid")).limit(k)
    if tag == "UserQuery":
        return boosted(search_parsed(index, _text(el), k=k))
    if tag == "BooleanQuery":
        must, should, must_not = [], [], []
        mm = int(el.get("minimumNumberShouldMatch", "0"))
        for cl in el:
            if cl.tag != "Clause":
                raise ValueError(f"BooleanQuery child {cl.tag!r} != Clause")
            occur = cl.get("occurs", "should")
            inner = list(cl)
            if len(inner) != 1 or inner[0].tag != "TermQuery":
                raise ValueError(
                    "engine BooleanQuery clauses are TermQuery nodes"
                )
            tq = TermQuery(
                _text(inner[0]).lower(),
                boost=float(inner[0].get("boost", "1.0")),
            )
            {"must": must, "should": should, "mustNot": must_not}[occur].append(tq)
        q = BooleanQuery(
            tuple(must), tuple(should), tuple(must_not), mm
        )
        return boosted(search(index, q, k=k, round_dp=round_dp))
    if tag == "DisjunctionMaxQuery":
        tie = float(el.get("tieBreaker", "0.0"))
        clauses = [_text(c).lower() for c in el if c.tag == "TermQuery"]
        return boosted(dismax(index, clauses, tie=tie, k=k, round_dp=round_dp))
    if tag == "SpanTerm":
        return boosted(
            span_or_topk(index, [_text(el).lower()], round_dp=round_dp).limit(k)
        )
    if tag == "SpanOrTerms":
        terms = list(dict.fromkeys(analyze_text(_text(el))))
        return boosted(span_or_topk(index, terms, round_dp=round_dp).limit(k))
    if tag == "SpanNear":
        slop = int(el.get("slopFactor", "0"))
        in_order = el.get("inOrder", "true").lower() == "true"
        terms = [_span_clause_terms(c) for c in el]
        out = span_near_topk(
            index, terms, slop=slop, in_order=in_order, round_dp=round_dp
        )
        return boosted(
            out.orderBy(F.desc("score"), F.asc("docid")).limit(k)
        )
    if tag == "SpanFirst":
        end = int(el.get("end", "1"))
        inner = list(el)
        if len(inner) != 1:
            raise ValueError("SpanFirst takes one span child")
        terms = _span_chain_terms(inner[0])
        out = span_first_topk(index, terms, end=end, round_dp=round_dp)
        return boosted(out.orderBy(F.desc("score"), F.asc("docid")).limit(k))
    if tag == "SpanNot":
        inc = el.find("Include")
        exc = el.find("Exclude")
        if inc is None or exc is None:
            raise ValueError("SpanNot needs Include and Exclude children")
        include_terms = _span_chain_terms(list(inc)[0])
        exclude = _span_chain_terms(list(exc)[0])
        if len(exclude) != 1 or not isinstance(exclude[0], str):
            raise ValueError("engine SpanNot excludes a single term")
        out = span_not_topk(
            index, include_terms, exclude[0], round_dp=round_dp
        )
        return boosted(out.orderBy(F.desc("score"), F.asc("docid")).limit(k))
    if tag in ("ConstantScoreQuery", "FilteredQuery"):
        from lucene_solr_spark.search.filtercache import terms_filter

        tf_el = el.find(".//TermsFilter")
        if tf_el is None:
            raise ValueError(f"{tag} supports a TermsFilter child")
        fterms = list(dict.fromkeys(analyze_text(_text(tf_el))))
        docset = terms_filter(index, fterms)
        if tag == "ConstantScoreQuery":
            return docset.select(
                "docid", F.lit(boost).alias("score")
            ).orderBy(F.asc("docid")).limit(k)
        qel = [c for c in el if c.tag != "TermsFilter"]
        if len(qel) != 1:
            raise ValueError("FilteredQuery needs exactly one query child")
        inner = _execute(index, qel[0], k=1 << 31 - 1, round_dp=round_dp)
        return (
            inner.join(docset, "docid", "left_semi")
            .orderBy(F.desc("score"), F.asc("docid"))
            .limit(k)
        )
    raise ValueError(f"unsupported XML query node {tag!r}")


def _span_clause_terms(el):
    """A SpanNear clause: SpanTerm -> term string; SpanOrTerms -> term list
    (the engine's nested span-or clause form)."""
    if el.tag == "SpanTerm":
        return _text(el).lower()
    if el.tag == "SpanOrTerms":
        return list(dict.fromkeys(analyze_text(_text(el))))
    raise ValueError(f"unsupported span clause {el.tag!r}")


def _span_chain_terms(el) -> list:
    """A span tree flattened to the engine's term-chain forms."""
    if el.tag == "SpanTerm":
        return [_text(el).lower()]
    if el.tag == "SpanNear":
        return [_span_clause_terms(c) for c in el]
    raise ValueError(f"unsupported span subtree {el.tag!r}")

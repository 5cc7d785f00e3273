from lucene_solr_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    RegexpQuery,
    ReversedWildcardQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_solr_spark.search.bm25 import (
    SCORE_TEMPLATE,
    score_expr_sql,
    search,
    term_scores,
)
from lucene_solr_spark.search.qparsers import qparser_search

__all__ = [
    "BooleanQuery", "FuzzyQuery", "MatchAllQuery", "PhraseQuery",
    "PrefixQuery", "RangeQuery", "RegexpQuery", "ReversedWildcardQuery",
    "TermQuery", "WildcardQuery",
    "SCORE_TEMPLATE", "score_expr_sql", "search", "term_scores",
    "qparser_search",
]

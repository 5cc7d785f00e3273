from lucene_solr_spark.functions.date_math import parse_date_math
from lucene_solr_spark.functions.value_sources import (
    with_ord,
    with_scale,
    with_termfreq,
    FUNCTIONS,
    parse_function_query,
    resolve_query_sources,
)

__all__ = [
    "FUNCTIONS",
    "parse_date_math",
    "parse_function_query",
    "resolve_query_sources",
    "with_ord",
    "with_scale",
    "with_termfreq",
]

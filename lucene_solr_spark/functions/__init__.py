from lucene_solr_spark.functions.value_sources import (
    FUNCTIONS,
    parse_function_query,
)

__all__ = ["FUNCTIONS", "parse_function_query"]

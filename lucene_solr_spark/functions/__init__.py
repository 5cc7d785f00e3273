from lucene_solr_spark.functions.date_math import parse_date_math
from lucene_solr_spark.functions.value_sources import (
    with_scale,
    FUNCTIONS,
    parse_function_query,
)

__all__ = ["FUNCTIONS", "parse_date_math", "parse_function_query", "with_scale"]

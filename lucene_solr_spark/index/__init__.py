from lucene_solr_spark.index.builder import IndexTables, build_index
from lucene_solr_spark.index.fields import (
    MultiFieldIndex,
    build_multifield_index,
    dismax_fields,
    search_fields,
    search_parsed_fields,
)

__all__ = [
    "IndexTables",
    "build_index",
    "MultiFieldIndex",
    "build_multifield_index",
    "dismax_fields",
    "search_fields",
    "search_parsed_fields",
]

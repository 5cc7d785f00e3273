from lucene_solr_spark.facets.facets import (
    collapse,
    facet_field,
    facet_query,
    facet_range,
    group_topk,
    interval_facets,
    pivot_facets,
    stats_component,
    terms_component,
)

__all__ = [
    "collapse", "facet_field", "facet_query", "facet_range", "group_topk",
    "interval_facets", "pivot_facets", "stats_component", "terms_component",
]

from lucene_solr_spark.facets.facets import (
    collapse,
    expand_component,
    facet_field,
    facet_query,
    facet_range,
    facet_range_extended,
    group_topk,
    interval_facets,
    pivot_facets,
    stats_component,
    terms_component,
)

__all__ = [
    "collapse", "expand_component", "facet_field", "facet_query",
    "facet_range", "facet_range_extended", "group_topk", "interval_facets",
    "pivot_facets", "stats_component", "terms_component",
]

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
from lucene_solr_spark.facets.taxonomy import (
    drill_down,
    drill_sideways_counts,
    facet_path,
    taxonomy_top_children,
)

__all__ = [
    "collapse", "expand_component", "facet_field", "facet_query",
    "facet_range", "facet_range_extended", "group_topk", "interval_facets",
    "pivot_facets", "stats_component", "terms_component",
    "drill_down", "drill_sideways_counts", "facet_path",
    "taxonomy_top_children",
]

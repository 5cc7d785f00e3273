from lucene_solr_spark.store.store import (
    IndexStore,
    SimulatedFailure,
    build_pages_to_store,
    delete_by_key,
    delete_by_term,
    delete_docids,
    load_index,
    open_index,
    postings_from_compressed,
    realtime_get,
)

__all__ = [
    "IndexStore",
    "SimulatedFailure",
    "build_pages_to_store",
    "delete_by_key",
    "delete_by_term",
    "delete_docids",
    "load_index",
    "open_index",
    "postings_from_compressed",
    "realtime_get",
]

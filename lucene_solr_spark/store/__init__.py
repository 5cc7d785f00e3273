from lucene_solr_spark.store.store import (
    IndexStore,
    SimulatedFailure,
    build_pages_to_store,
    load_index,
    postings_from_compressed,
)

__all__ = [
    "IndexStore",
    "SimulatedFailure",
    "build_pages_to_store",
    "load_index",
    "postings_from_compressed",
]

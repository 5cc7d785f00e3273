from lucene_solr_spark.streaming.incremental import (
    StreamingIndexer,
    compact_store,
    load_streaming_index,
    update_documents,
)

__all__ = [
    "StreamingIndexer",
    "compact_store",
    "load_streaming_index",
    "update_documents",
]

from lucene_solr_spark.streaming.incremental import (
    StreamingIndexer,
    load_streaming_index,
)

__all__ = ["StreamingIndexer", "load_streaming_index"]

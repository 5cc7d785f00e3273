from lucene_solr_spark.index.builder import IndexTables, build_index

__all__ = ["IndexTables", "build_index"]

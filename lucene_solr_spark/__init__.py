"""lucene_solr_spark — a PySpark-native inverted-index + BM25 engine.

Brand-new engine (not a port) with the query/data-processing capabilities of
Apache Lucene/Solr 4.10.5 + the SOLR-5894 sparse-faceting fork, re-expressed
Spark-first: DataFrame/Catalyst plans for everything declarative, numpy/Arrow
kernels only where Spark has no primitive (postings codec, block-max WAND).
"""

__version__ = "0.1.0"

from lucene_solr_spark.classification.classify import (  # noqa: F401
    knn_classify,
    naive_bayes_classify,
)

from lucene_solr_spark.oracle.sqlgen import PRELUDE, bool_sql, score_cols_sql

__all__ = ["PRELUDE", "bool_sql", "score_cols_sql"]

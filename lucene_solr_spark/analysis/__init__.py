from lucene_solr_spark.analysis.analyzer import (
    ENGLISH_STOP_WORDS,
    MAX_TOKEN_LENGTH,
    TOKEN_PATTERN,
    StandardAnalyzer,
    analyze_series,
    raw_tokens_expr,
    tokens_expr,
)

__all__ = [
    "ENGLISH_STOP_WORDS",
    "MAX_TOKEN_LENGTH",
    "TOKEN_PATTERN",
    "StandardAnalyzer",
    "analyze_series",
    "raw_tokens_expr",
    "tokens_expr",
]

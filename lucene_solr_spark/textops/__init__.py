"""Training-data pipeline operators over web-text tables.

Beyond the reference's own search operators, a 100 TB corpus pipeline needs
dedup, similarity search, text analysis, and multimodal plumbing — all
implemented Spark-first (built-in expressions where possible, Arrow-batched
UDFs only where not) and each backed by a DuckDB-checkable oracle.
"""

from lucene_solr_spark.textops.dedup import (
    exact_dup_groups,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    near_dup_pairs,
    simhash,
    simhash_near_pairs,
)
from lucene_solr_spark.textops.analyze import (
    doc_fingerprint,
    language_id,
    quality_score,
    token_stats,
)
from lucene_solr_spark.textops.similarity import (
    cosine_topk,
    embedding_near_dup,
    lsh_bucketed_topk,
    with_sign_buckets,
)

__all__ = [
    "exact_dup_groups", "minhash_signatures", "minhash_lsh_candidates",
    "jaccard_pairs", "near_dup_pairs", "simhash", "simhash_near_pairs",
    "language_id", "quality_score", "token_stats", "doc_fingerprint",
    "cosine_topk", "embedding_near_dup", "lsh_bucketed_topk",
    "with_sign_buckets",
]

"""Optional token filters — the TokenFilterFactory extension surface.

The reference ships ~120 tokenizer/filter factories configurable per field
type (lucene/analysis/common/src/java/org/apache/lucene/analysis/util/
TokenFilterFactory.java registry + schema.xml chains).  The engine's analog:
each filter is a Column -> Column transform over the token array, composable
after ``StandardAnalyzer.tokens_col`` and executed JVM-side (higher-order
array functions — no UDFs, whole-stage codegen), so a custom chain costs the
same as the standard one.

Implemented factories (the common-schema set):
- synonym_filter        — SynonymFilterFactory (single-token, map form)
- shingle_filter        — ShingleFilter (word n-grams, e.g. MinHash input)
- edge_ngram_filter     — EdgeNGramTokenFilter (prefix grams, search-as-you-type)
- ngram_filter          — NGramTokenFilter (char n-grams)
- english_minimal_stem  — EnglishMinimalStemFilter (plural s-stripping)
- length_filter         — LengthFilterFactory (min/max token length)
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def synonym_filter(tokens: Column, synonyms: dict[str, str]) -> Column:
    """SynonymFilterFactory (map form, replace=true): each token maps through
    the synonym table; unknown tokens pass unchanged.  One broadcast-safe
    MapType literal, `element_at` + coalesce — JVM-side."""
    if not synonyms:
        return tokens
    pairs = [x for kv in synonyms.items() for x in kv]
    m = F.create_map(*[F.lit(x) for x in pairs])
    return F.transform(tokens, lambda t: F.coalesce(m[t], t))


def shingle_filter(tokens: Column, n: int = 2, sep: str = " ") -> Column:
    """ShingleFilter (lucene/analysis/common/.../shingle/ShingleFilter.java):
    word n-grams over the token stream — the MinHash/similarity input shape.
    Empty when the doc has fewer than n tokens."""
    count = F.size(tokens) - F.lit(n - 1)
    idx = F.sequence(F.lit(1), F.greatest(count, F.lit(0)))
    return F.when(count <= 0, F.array()).otherwise(
        F.transform(idx, lambda i: F.concat_ws(sep, F.slice(tokens, i, n)))
    )


def edge_ngram_filter(tokens: Column, min_gram: int = 2, max_gram: int = 4) -> Column:
    """EdgeNGramTokenFilter: leading-edge prefixes of each token, lengths
    min_gram..min(max_gram, len) — the search-as-you-type index shape."""
    grams = F.sequence(F.lit(min_gram), F.lit(max_gram))
    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.filter(
                F.transform(
                    grams,
                    lambda g: F.when(F.length(t) >= g, t.substr(F.lit(1), g)),
                ),
                lambda x: x.isNotNull(),
            ),
        )
    )


def ngram_filter(tokens: Column, min_gram: int = 2, max_gram: int = 3) -> Column:
    """NGramTokenFilter: all character n-grams of each token with lengths
    min_gram..max_gram (fuzzy/substring index shape)."""

    def grams_of(t: Column) -> Column:
        sizes = F.sequence(F.lit(min_gram), F.lit(max_gram))
        per_size = F.transform(
            sizes,
            # F.sequence(1, 0) DESCENDS — short tokens need the empty guard
            lambda g: F.when(
                F.length(t) >= g,
                F.transform(
                    F.sequence(F.lit(1), F.length(t) - g + 1),
                    lambda i: t.substr(i, g),
                ),
            ).otherwise(F.array().cast("array<string>")),
        )
        return F.flatten(per_size)

    return F.flatten(F.transform(tokens, grams_of))


def english_minimal_stem(tokens: Column) -> Column:
    """EnglishMinimalStemFilter (lucene/analysis/common/.../en/
    EnglishMinimalStemmer.java): strip a trailing plural 's' when the token
    is longer than 2 chars and does not end in 'ss'/'us'/'is'."""
    def stem(t: Column) -> Column:
        keep = (
            (F.length(t) <= 2)
            | ~t.endswith("s")
            | t.endswith("ss")
            | t.endswith("us")
            | t.endswith("is")
        )
        return F.when(keep, t).otherwise(t.substr(F.lit(1), F.length(t) - 1))

    return F.transform(tokens, stem)


def length_filter(tokens: Column, min_len: int = 1, max_len: int = 255) -> Column:
    """LengthFilterFactory: drop tokens outside [min_len, max_len]."""
    return F.filter(
        tokens, lambda t: (F.length(t) >= min_len) & (F.length(t) <= max_len)
    )

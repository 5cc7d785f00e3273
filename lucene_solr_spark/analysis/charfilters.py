"""CharFilters — pre-tokenizer text transforms (CharFilterFactory surface).

Reference: char filters wrap the Reader BEFORE tokenization
(lucene/analysis/common/src/java/org/apache/lucene/analysis/charfilter/):
MappingCharFilter applies a longest-match literal mapping (NormalizeCharMap
FST), PatternReplaceCharFilter a regex replacement; HTMLStripCharFilter's
analog already lives in pages.extract_text_expr.

Spark analog: Column(text) -> Column(text) transforms composed in front of
``StandardAnalyzer.tokens_col`` — e.g.
``an.tokens_col(mapping_char_filter(F.col("text"), {...}))``.  All JVM-side
codegen; offset correction (Lucene's correctOffset bookkeeping) is
unnecessary because downstream positions are TOKEN ordinals, not char
offsets.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def mapping_char_filter(text: Column, mapping: dict[str, str]) -> Column:
    """MappingCharFilter (charfilter/MappingCharFilter.java:40-110): literal
    source->target rewrites, longest source first (the FST's greedy
    longest-match order re-expressed as replace precedence)."""
    out = text
    for src in sorted(mapping, key=len, reverse=True):
        out = F.replace(out, F.lit(src), F.lit(mapping[src]))
    return out


def pattern_replace_char_filter(text: Column, pattern: str, replacement: str) -> Column:
    """PatternReplaceCharFilter (charfilter/PatternReplaceCharFilter.java:
    35-70): regex replacement over the whole pre-token text."""
    return F.regexp_replace(text, pattern, replacement)

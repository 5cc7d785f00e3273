"""The tokenizer zoo beyond StandardTokenizer: whitespace, letter,
lowercase, keyword, pattern, and path-hierarchy tokenizers — each as a
JVM-side Column expression (plus a pure-Python twin used as oracle and
for term-level callers).

Reference:
- lucene/analysis/common/src/java/org/apache/lucene/analysis/core/
  WhitespaceTokenizer.java / LetterTokenizer.java /
  LowerCaseTokenizer.java (CharTokenizer subclasses: maximal runs of
  accepted chars, 255-char token cap) and KeywordTokenizer.java (whole
  input, one token)
- .../pattern/PatternTokenizer.java (:87-136 group=-1 split semantics
  dropping empties; group>=0 emits that capture group per match)
- .../path/PathHierarchyTokenizer.java (:incrementToken — one token per
  path prefix ending at each delimiter (plus the whole path), skip
  drops leading components, delimiter chars rewritten to `replacement`
  in the emitted text; TestPathHierarchyTokenizer cases incl. leading/
  trailing delimiters and delimiter-only inputs)

All reference test expectations pass in tests/test_tokenizers.py, with
a Column-vs-Python differential per tokenizer.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

_MAX_TOKEN = 255  # CharTokenizer.MAX_WORD_LEN


# --- whitespace / letter / lowercase / keyword ---

def whitespace_tokenizer(text: Column) -> Column:
    toks = F.split(text, r"\s+")
    return F.filter(
        toks, lambda t: (F.length(t) > 0) & (F.length(t) <= _MAX_TOKEN)
    )


def whitespace_tokenize(s: str) -> list[str]:
    return [t for t in re.split(r"\s+", s) if t and len(t) <= _MAX_TOKEN]


def letter_tokenizer(text: Column) -> Column:
    toks = F.regexp_extract_all(text, F.lit(r"\p{L}+"), 0)
    return F.filter(toks, lambda t: F.length(t) <= _MAX_TOKEN)


def letter_tokenize(s: str) -> list[str]:
    return [
        t
        for t in re.findall(r"[^\W\d_]+", s, re.UNICODE)
        if len(t) <= _MAX_TOKEN
    ]


def lowercase_tokenizer(text: Column) -> Column:
    return F.transform(letter_tokenizer(text), F.lower)


def lowercase_tokenize(s: str) -> list[str]:
    return [t.lower() for t in letter_tokenize(s)]


def keyword_tokenizer(text: Column) -> Column:
    return F.when(
        text.isNotNull() & (F.length(text) > 0), F.array(text)
    ).otherwise(F.array().cast("array<string>"))


def keyword_tokenize(s: str) -> list[str]:
    return [s] if s else []


# --- pattern tokenizer ---

def pattern_tokenizer(text: Column, pattern: str, group: int = -1) -> Column:
    """PatternTokenizer: group=-1 splits on the pattern (empty tokens
    removed, as the reference does); group>=0 emits that capture group
    of every match."""
    if group < 0:
        toks = F.split(text, pattern)
    else:
        toks = F.regexp_extract_all(text, F.lit(pattern), group)
    return F.filter(toks, lambda t: F.length(t) > 0)


def pattern_tokenize(s: str, pattern: str, group: int = -1) -> list[str]:
    if group < 0:
        return [t for t in re.split(pattern, s) if t]
    return [
        m.group(group) for m in re.finditer(pattern, s) if m.group(group)
    ]


# --- path hierarchy tokenizer ---

def path_hierarchy_tokenize(
    s: str,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> list[str]:
    """PathHierarchyTokenizer: one token per path prefix — ends at every
    delimiter occurrence past the start plus the full path; `skip`
    drops that many leading components; delimiters in the OUTPUT are
    rewritten to `replacement`."""
    if not s:
        return []
    rep = delimiter if replacement is None else replacement
    ends = [i for i, c in enumerate(s) if c == delimiter and i > 0]
    ends.append(len(s))
    start = 0
    if skip > 0:
        if skip > len(ends) - 1:
            return []
        start = ends[skip - 1]
        ends = ends[skip:]
    out = []
    for e in ends:
        tok = s[start:e]
        if tok:
            out.append(tok.replace(delimiter, rep))
    return out


def path_hierarchy_tokenizer(
    text: Column,
    delimiter: str = "/",
    replacement: str | None = None,
    skip: int = 0,
) -> Column:
    """Column form: strip a leading delimiter, split on the delimiter,
    emit the rejoined component prefixes (re-prefixed with the
    replacement when the path was absolute or components were skipped)
    — one JVM higher-order expression."""
    rep = delimiter if replacement is None else replacement
    has_lead = F.startswith(text, F.lit(delimiter))
    stripped = F.when(
        has_lead, F.substring(text, 2, 2_000_000_000)
    ).otherwise(text)
    parts = F.split(stripped, re.escape(delimiter))
    n = F.size(parts)
    lead = F.when(
        has_lead | F.lit(skip > 0), F.lit(rep)
    ).otherwise(F.lit(""))
    idx = F.when(
        n >= 1 + skip, F.sequence(F.lit(1 + skip), n)
    ).otherwise(F.array().cast("array<int>"))
    prefixes = F.transform(
        idx,
        lambda i: F.concat(
            lead,
            F.array_join(F.slice(parts, 1 + skip, i - skip), rep),
        ),
    )
    return F.filter(prefixes, lambda t: F.length(t) > 0)

"""Query model — the engine's ``Query`` tree.

Mirrors the reference's query zoo (SURVEY.md §2.5; lucene/core/.../search/):
TermQuery, BooleanQuery (MUST/SHOULD/MUST_NOT + minimumNumberShouldMatch),
PhraseQuery, Prefix/Wildcard/Regexp/Fuzzy (multi-term rewrite against the term
dictionary, MultiTermQuery.java), numeric/term ranges, MatchAllDocsQuery.
The "Weight/Scorer" stage is the Catalyst plan produced by search/bm25.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class TermQuery:
    term: str
    boost: float = 1.0
    field: str | None = None  # None -> the index's default field


@dataclass(frozen=True)
class PhraseQuery:
    terms: tuple[str, ...]
    slop: int = 0
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class MultiPhraseQuery:
    """MultiPhraseQuery (lucene/core/.../search/MultiPhraseQuery.java): a
    phrase whose positions each hold one OR MORE terms (synonym-expanded
    phrases).  ``slots`` is one tuple of alternative terms per position."""

    slots: tuple[tuple[str, ...], ...]
    slop: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class PrefixQuery:
    prefix: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class WildcardQuery:
    pattern: str  # Lucene wildcard: * and ?
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class ReversedWildcardQuery:
    """Wildcard routed through the ReversedWildcardFilterFactory gate
    (solr/core/src/java/org/apache/solr/analysis/
    ReversedWildcardFilterFactory.java:103-140 shouldReverse): when the
    wildcard is leading-ish, the pattern is reversed (marker-first) and
    matched against the reversed term dictionary, turning a full-dictionary
    scan into a literal-prefix LIKE that Catalyst rewrites to StartsWith."""

    pattern: str  # Lucene wildcard: * and ?
    boost: float = 1.0
    field: str | None = None
    max_pos_asterisk: int = 2
    max_pos_question: int = 1
    min_trailing: int = 2
    max_fraction_asterisk: float = 0.0


@dataclass(frozen=True)
class RegexpQuery:
    pattern: str
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class FuzzyQuery:
    term: str
    max_edits: int = 1
    boost: float = 1.0
    field: str | None = None


@dataclass(frozen=True)
class RangeQuery:
    """Term range over the dictionary (TermRangeQuery.java) — for numeric
    ranges over docvalues columns use a plain DataFrame filter instead."""

    lower: str | None
    upper: str | None
    include_lower: bool = True
    include_upper: bool = True
    field: str | None = None


@dataclass(frozen=True)
class MatchAllQuery:
    boost: float = 1.0


@dataclass(frozen=True)
class BooleanQuery:
    """MUST ∧ (>=mm of SHOULD) ∧ ¬MUST_NOT, scored as the sum of matching
    term scores (BooleanQuery.java:100-218 sum semantics; BM25 path ignores
    coord/queryNorm per BM25Similarity.java:284-294)."""

    must: tuple[TermQuery, ...] = ()
    should: tuple[TermQuery, ...] = ()
    must_not: tuple[TermQuery, ...] = ()
    minimum_should_match: int = 0

    @staticmethod
    def of(must=(), should=(), must_not=(), mm: int = 0) -> "BooleanQuery":
        mk = lambda xs: tuple(TermQuery(x) if isinstance(x, str) else x for x in xs)
        return BooleanQuery(mk(must), mk(should), mk(must_not), mm)

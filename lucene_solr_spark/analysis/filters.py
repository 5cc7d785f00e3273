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
- ascii_folding_filter  — ASCIIFoldingFilter (Latin accents -> ASCII base)
- word_delimiter_filter — WordDelimiterFilter (case/numeric/delimiter splits,
                          possessive strip, catenate/preserve options)
- trim_filter / pattern_replace_filter / keep_word_filter / stop_filter /
  reverse_string_filter / truncate_filter / capitalization_filter /
  limit_token_count_filter — the small utility factories
- common_grams_filter / common_grams_query_filter — CommonGramsFilter
  index/query modes (phrase acceleration over frequent words)
- english_possessive_filter — EnglishPossessiveFilter (trailing 's)
- remove_duplicates_filter — RemoveDuplicatesTokenFilter (same term+position)
- elision_filter — ElisionFilter (French article contractions)
- scandinavian_normalization_filter / scandinavian_folding_filter
- codepoint_count_filter — CodepointCountFilter
- hyphenated_words_filter — HyphenatedWordsFilter (line-break rejoin)
- keyword_marker_map / stemmer_override_map / keyword_repeat_map —
  KeywordMarker/StemmerOverride/KeywordRepeat as TRANSFORMERS of the
  vocabulary term-map algebra the stemmers integrate through
  (index/builder.py _apply_term_map; 1:N maps fan out via the join)
(PorterStemFilter lives in analysis/stemmer.py; multi-word synonyms in
analysis/synonyms.py.)
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


# ---------------------------------------------------------------------------
# Round-3b factory additions: ASCIIFolding, WordDelimiter, and the small
# utility factories (trim / pattern-replace / keep / stop / reverse /
# truncate / capitalization / limit).  All stay Column -> Column JVM-side.
# ---------------------------------------------------------------------------


def _build_fold_table() -> tuple[str, str]:
    """1:1 fold pairs for ASCIIFoldingFilter's Latin ranges: NFD-decomposable
    letters (strip combining marks) plus the explicit non-decomposable cases
    from ASCIIFoldingFilter.java's switch (O-slash, eth, stroke letters,
    dotless i)."""
    import unicodedata

    src, dst = [], []
    for cp in range(0x00C0, 0x0250):  # Latin-1 Supplement .. Latin Ext-B head
        ch = chr(cp)
        base = "".join(
            c for c in unicodedata.normalize("NFD", ch)
            if not unicodedata.combining(c)
        )
        if base != ch and len(base) == 1 and ord(base) < 128:
            src.append(ch)
            dst.append(base)
    for ch, r in [
        ("Ø", "O"), ("ø", "o"),   # Ø ø
        ("Đ", "D"), ("đ", "d"),   # Đ đ
        ("Ł", "L"), ("ł", "l"),   # Ł ł
        ("Ð", "D"), ("ð", "d"),   # Ð ð
        ("ı", "i"),                     # ı
        ("Ħ", "H"), ("ħ", "h"),   # Ħ ħ
        ("Ŧ", "T"), ("ŧ", "t"),   # Ŧ ŧ
    ]:
        src.append(ch)
        dst.append(r)
    return "".join(src), "".join(dst)


_FOLD_SRC, _FOLD_DST = _build_fold_table()

# multi-char expansions (ASCIIFoldingFilter.java ligature/digraph cases)
_FOLD_MULTI = [
    ("ß", "ss"), ("Æ", "AE"), ("æ", "ae"),
    ("Œ", "OE"), ("œ", "oe"), ("Þ", "TH"), ("þ", "th"),
    ("Ĳ", "IJ"), ("ĳ", "ij"), ("ﬁ", "fi"), ("ﬂ", "fl"),
]


def ascii_folding_filter(tokens: Column) -> Column:
    """ASCIIFoldingFilter (lucene/analysis/common/.../miscellaneous/
    ASCIIFoldingFilter.java): fold accented Latin letters to their ASCII
    base.  Coverage: the NFD-decomposable Latin-1 Supplement / Latin
    Extended-A/B-head letters plus the explicit stroke/eth/ligature cases —
    the web-text working set of the reference's full BMP switch.  One
    ``translate`` (1:1) plus a short literal-replace chain (1:n), all
    codegen."""
    def fold(t: Column) -> Column:
        out = F.translate(t, _FOLD_SRC, _FOLD_DST)
        for ch, rep in _FOLD_MULTI:
            out = F.replace(out, F.lit(ch), F.lit(rep))
        return out

    return F.transform(tokens, fold)


def ascii_folding_filter_preserve(tokens: Column) -> Column:
    """ASCIIFoldingFilter with preserveOriginal=true (the factory option,
    ASCIIFoldingFilterFactory.java): each token that CHANGES under the fold
    emits the folded form followed by the original (the filter's
    State-restore stacking order keeps the folded token first); unchanged
    tokens emit once."""
    def fold(t: Column) -> Column:
        out = F.translate(t, _FOLD_SRC, _FOLD_DST)
        for ch, rep in _FOLD_MULTI:
            out = F.replace(out, F.lit(ch), F.lit(rep))
        return out

    return F.flatten(
        F.transform(
            tokens,
            lambda t: F.when(fold(t) == t, F.array(t)).otherwise(
                F.array(fold(t), t)
            ),
        )
    )


def ascii_fold_text(s: str) -> str:
    """Pure-Python mirror of ascii_folding_filter for goldens."""
    table = {ord(a): b for a, b in zip(_FOLD_SRC, _FOLD_DST)}
    s = s.translate(table)
    for ch, rep in _FOLD_MULTI:
        s = s.replace(ch, rep)
    return s


_WDF_MARK = "\x01"


def word_delimiter_filter(
    tokens: Column,
    generate_word_parts: bool = True,
    generate_number_parts: bool = True,
    catenate_words: bool = False,
    catenate_numbers: bool = False,
    catenate_all: bool = False,
    preserve_original: bool = False,
    split_on_case_change: bool = True,
    split_on_numerics: bool = True,
    stem_english_possessive: bool = True,
) -> Column:
    """WordDelimiterFilter (lucene/analysis/common/.../miscellaneous/
    WordDelimiterFilter.java): split tokens into subwords at non-alphanumeric
    delimiters, lower->UPPER case transitions (:splitOnCaseChange), and
    letter<->digit boundaries (:splitOnNumerics); strip English possessive
    's; optionally emit catenated word/number/all runs and the original.

    Emission model: the engine's filters are bag-of-terms array transforms
    (order: original?, subwords, catenations) — position-graph interleaving
    does not affect term statistics, which is the indexed surface.
    Catenations emit only when >=2 parts exist (the <2 case would duplicate
    the generated part).  An upper-run boundary splits before the last
    capital (HTTPServer -> HTTP, Server), matching the reference."""
    def parts_of(t: Column) -> Column:
        s = t
        if stem_english_possessive:
            # possessive 's at a subword end (WordDelimiterIterator
            # endsWithPossessive): before a delimiter or at end-of-token
            s = F.regexp_replace(s, r"['’]s(?![A-Za-z0-9])", "")
        if split_on_case_change:
            s = F.regexp_replace(s, r"(\p{Ll})(\p{Lu})", f"$1{_WDF_MARK}$2")
            s = F.regexp_replace(s, r"(\p{Lu})(\p{Lu}\p{Ll})", f"$1{_WDF_MARK}$2")
        if split_on_numerics:
            s = F.regexp_replace(s, r"([A-Za-z])([0-9])", f"$1{_WDF_MARK}$2")
            s = F.regexp_replace(s, r"([0-9])([A-Za-z])", f"$1{_WDF_MARK}$2")
        s = F.regexp_replace(s, f"[^A-Za-z0-9{_WDF_MARK}]+", _WDF_MARK)
        return F.filter(F.split(s, _WDF_MARK), lambda p: F.length(p) > 0)

    def emit(t: Column) -> Column:
        parts = parts_of(t)
        word_parts = F.filter(parts, lambda p: p.rlike("[A-Za-z]"))
        num_parts = F.filter(parts, lambda p: p.rlike("^[0-9]+$"))
        out = F.array().cast("array<string>")
        if preserve_original:
            out = F.concat(out, F.array(t))
        if generate_word_parts:
            out = F.concat(out, word_parts)
        if generate_number_parts:
            out = F.concat(out, num_parts)
        if catenate_words:
            cat = F.array_join(word_parts, "")
            out = F.concat(
                out,
                F.when(F.size(word_parts) >= 2, F.array(cat)).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        if catenate_numbers:
            cat = F.array_join(num_parts, "")
            out = F.concat(
                out,
                F.when(F.size(num_parts) >= 2, F.array(cat)).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        if catenate_all:
            cat = F.array_join(parts, "")
            out = F.concat(
                out,
                F.when(F.size(parts) >= 2, F.array(cat)).otherwise(
                    F.array().cast("array<string>")
                ),
            )
        return out

    return F.flatten(F.transform(tokens, emit))


def trim_filter(tokens: Column) -> Column:
    """TrimFilterFactory: strip leading/trailing whitespace per token."""
    return F.transform(tokens, lambda t: F.trim(t))


def pattern_replace_filter(tokens: Column, pattern: str, replacement: str) -> Column:
    """PatternReplaceFilterFactory (replace=all): regexp_replace per token."""
    return F.transform(
        tokens, lambda t: F.regexp_replace(t, pattern, replacement)
    )


def keep_word_filter(tokens: Column, keep: tuple[str, ...]) -> Column:
    """KeepWordFilterFactory: keep only tokens in the given set."""
    return F.filter(tokens, lambda t: t.isin(*keep))


def stop_filter(tokens: Column, stopwords: tuple[str, ...]) -> Column:
    """StopFilterFactory with a custom ``words=`` set (the analyzer chain
    owns the default English set and its position-gap semantics; this is the
    standalone factory for custom chains)."""
    return F.filter(tokens, lambda t: ~t.isin(*stopwords))


def reverse_string_filter(tokens: Column) -> Column:
    """ReverseStringFilterFactory: reverse each token (the leading-wildcard
    index trick: index reversed terms, rewrite *suffix to prefix search)."""
    return F.transform(tokens, F.reverse)


REVERSE_MARKER = "\u0001"  # ReverseStringFilter.START_OF_HEADING_MARKER


def reversed_wildcard_filter(
    tokens: Column, with_original: bool = True, marker: str = REVERSE_MARKER
) -> Column:
    """ReversedWildcardFilter (solr/core/src/java/org/apache/solr/analysis/
    ReversedWildcardFilter.java:55-81): each token becomes marker-prefixed
    reversed form (append marker then reverse the buffer — the marker lands
    FIRST), emitted BEFORE the original when ``with_original`` (the filter
    saves the original's state and replays it at positionIncrement 0 —
    goldens TestReversedWildcardFilterFactory.java:62-79).  Spark's string
    ``reverse`` iterates code points, matching the reference's
    surrogate-pair-preserving reverse (java :85-150)."""
    rev = lambda t: F.concat(F.lit(marker), F.reverse(t))  # noqa: E731
    if not with_original:
        return F.transform(tokens, rev)
    return F.flatten(F.transform(tokens, lambda t: F.array(rev(t), t)))


def should_reverse(
    token: str,
    max_pos_asterisk: int = 2,
    max_pos_question: int = 1,
    min_trailing: int = 2,
    max_fraction_asterisk: float = 0.0,
) -> bool:
    """ReversedWildcardFilterFactory.shouldReverse (java :103-140): whether a
    wildcard query token gains from the reversed index — leading '?' / '*'
    inside the max positions, or a '*' in the leading fraction, with at
    least ``min_trailing`` chars after the last wildcard.  Defaults are the
    factory's (maxPosAsterisk=2, maxPosQuestion=1, minTrailing=2,
    maxFractionAsterisk disabled); gate goldens from
    TestReversedWildcardFilterFactory.java:160-171."""
    pos_q = token.find("?")
    pos_a = token.find("*")
    if pos_q == -1 and pos_a == -1:
        return False
    last_pos = max(token.rfind("?"), token.rfind("*"))
    if pos_q != -1:
        pos = min(pos_q, pos_a) if pos_a != -1 else pos_q
    else:
        pos = pos_a
    if len(token) - last_pos < min_trailing:
        return False
    if pos_q != -1 and pos_q < max_pos_question:
        return True
    if pos_a != -1 and pos_a < max_pos_asterisk:
        return True
    return bool(
        max_fraction_asterisk > 0.0 and pos < len(token) * max_fraction_asterisk
    )


def truncate_filter(tokens: Column, length: int) -> Column:
    """TruncateTokenFilterFactory: cap each token at ``length`` chars."""
    return F.transform(tokens, lambda t: t.substr(F.lit(1), F.lit(length)))


def capitalization_filter(tokens: Column) -> Column:
    """CapitalizationFilterFactory (default onlyFirstWord semantics per
    token): first letter upper, rest lower."""
    return F.transform(
        tokens,
        lambda t: F.concat(F.upper(t.substr(F.lit(1), F.lit(1))), F.lower(t.substr(F.lit(2), F.length(t)))),
    )


def limit_token_count_filter(tokens: Column, max_count: int) -> Column:
    """LimitTokenCountFilterFactory: keep only the first ``max_count``
    tokens (index-size guard for pathological documents)."""
    return F.slice(tokens, 1, max_count)


def common_grams_filter(tokens: Column, common_words: tuple[str, ...]) -> Column:
    """CommonGramsFilter (lucene/analysis/common/.../commongrams/
    CommonGramsFilter.java:36-130, index mode): every unigram, and after
    each token that forms a qualifying bigram with its successor (either
    word common) the '_'-joined gram — "the fox" -> [the, the_fox, fox]
    (the gram rides at the same position, type=gram; this array form keeps
    the emission order, position overlay is the index chain's concern)."""
    c = F.array(*[F.lit(w) for w in common_words])
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))

    def emit(i):
        t = F.element_at(tokens, i)
        nxt = F.element_at(tokens, i + 1)
        qual = (i < n) & (
            F.array_contains(c, t) | F.array_contains(c, nxt)
        )
        return F.when(
            qual, F.array(t, F.concat_ws("_", t, nxt))
        ).otherwise(F.array(t))

    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.flatten(F.transform(idx, emit))
    )


def common_grams_query_filter(
    tokens: Column, common_words: tuple[str, ...]
) -> Column:
    """CommonGramsQueryFilter (CommonGramsQueryFilter.java:40-110): the
    query-side form — each non-final position emits its qualifying gram
    (else its unigram); the final unigram is dropped when the preceding
    gram already contains it.  "the quick brown" -> [the_quick, quick,
    brown]; "quick the brown" -> [quick_the, the_brown]; goldens from
    CommonGramsFilterTest.testCommonGramsQueryFilter."""
    c = F.array(*[F.lit(w) for w in common_words])
    n = F.size(tokens)
    idx = F.sequence(F.lit(1), F.greatest(n, F.lit(1)))

    def qual(i):
        return F.array_contains(c, F.element_at(tokens, i)) | F.array_contains(
            c, F.element_at(tokens, i + 1)
        )

    def emit(i):
        t = F.element_at(tokens, i)
        gram = F.concat_ws("_", t, F.element_at(tokens, i + 1))
        non_final = F.when(qual(i), F.array(gram)).otherwise(F.array(t))
        final = F.when((i > 1) & qual(i - 1), F.array().cast("array<string>")
                       ).otherwise(F.array(t))
        return F.when(i < n, non_final).otherwise(final)

    return F.when(n == 0, F.array().cast("array<string>")).otherwise(
        F.flatten(F.transform(idx, emit))
    )


def english_possessive_filter(tokens: Column) -> Column:
    """EnglishPossessiveFilterFactory (lucene/analysis/common/.../en/
    EnglishPossessiveFilter.java): strip a trailing 's (apostrophe U+0027,
    right single quote U+2019, or fullwidth U+FF07, followed by s/S)."""
    return F.transform(
        tokens,
        lambda t: F.regexp_replace(t, "['’＇][sS]$", ""),
    )


def remove_duplicates_filter(positioned: Column) -> Column:
    """RemoveDuplicatesTokenFilterFactory (RemoveDuplicatesTokenFilter.java):
    drop tokens equal to an earlier token AT THE SAME POSITION (duplicates
    arise from graph emitters like synonyms, posInc=0).  Operates on the
    positioned form array<struct<term,pos>> and keeps first occurrence
    order."""
    # keep element i iff no identical (term,pos) appears earlier
    return F.filter(
        positioned,
        lambda x, i: ~F.exists(
            F.slice(positioned, 1, i),
            lambda y: (y["term"] == x["term"]) & (y["pos"] == x["pos"]),
        ),
    )


_ELISION_ARTICLES = (
    "jusqu", "quoiqu", "lorsqu", "puisqu",
    "qu", "l", "m", "t", "n", "s", "j", "d", "c",
)


def elision_filter(tokens: Column, articles: tuple[str, ...] = _ELISION_ARTICLES) -> Column:
    """ElisionFilterFactory (lucene/analysis/common/.../util/ElisionFilter
    .java:52-68 with FrenchAnalyzer.DEFAULT_ARTICLES, ignoreCase=true):
    find the first apostrophe (U+0027 or U+2019 only — the filter does not
    treat fullwidth U+FF07 as one) and, if the prefix before it is an
    article, strip prefix+apostrophe (l'avion -> avion).  The articles
    contain no apostrophes, so an anchored case-insensitive alternation
    matches exactly when the first-apostrophe prefix is an article."""
    pat = "(?i)^(?:" + "|".join(articles) + ")['’]"
    return F.transform(tokens, lambda t: F.regexp_replace(t, pat, ""))


def scandinavian_normalization_filter(tokens: Column) -> Column:
    """ScandinavianNormalizationFilter (lucene/analysis/common/.../
    miscellaneous/ScandinavianNormalizationFilter.java:61-120): normalize
    interchangeable Scandinavian characters äÄöÖ and digraphs aa/ao/ae/oe/oo
    to åÅæÆøØ.  The reference's single left-to-right scan replaces a digraph
    and resumes after it; ``regexp_replace`` scans identically
    (leftmost, non-overlapping), and because every replacement is non-ASCII
    while every digraph is ASCII, the sequential passes commute with the
    single scan.  Digraph passes run before the single-char translate: the
    scan checks the ORIGINAL next char, so a normalized ä never joins a
    digraph (reference goldens cover both orders)."""
    def norm(t: Column) -> Column:
        t = F.regexp_replace(t, "a[aoAO]", "å")
        t = F.regexp_replace(t, "A[aAoO]", "Å")
        t = F.regexp_replace(t, "a[eE]", "æ")
        t = F.regexp_replace(t, "A[eE]", "Æ")
        t = F.regexp_replace(t, "o[eEoO]", "ø")
        t = F.regexp_replace(t, "O[eEoO]", "Ø")
        return F.translate(t, "äÄöÖ", "æÆøØ")

    return F.transform(tokens, norm)


def scandinavian_folding_filter(tokens: Column) -> Column:
    """ScandinavianFoldingFilter (ScandinavianFoldingFilter.java:72-134):
    the more aggressive fold — åäæ->a, öø->o and digraph second-char
    deletion ([aA][aAeEoO], [oO][eEoO] keep the first char).  Same
    scan-equivalence argument as the normalization filter: deletions keep
    an ASCII char but the reference scan resumes after the consumed pair,
    exactly like non-overlapping regex replacement."""
    def fold(t: Column) -> Column:
        t = F.regexp_replace(t, "([aA])[aAeEoO]", "$1")
        t = F.regexp_replace(t, "([oO])[eEoO]", "$1")
        return F.translate(t, "åäæÅÄÆöøÖØ", "aaaAAAooOO")

    return F.transform(tokens, fold)


def codepoint_count_filter(tokens: Column, min_cp: int, max_cp: int) -> Column:
    """CodepointCountFilter (miscellaneous/CodepointCountFilter.java:48-52):
    keep tokens whose CODE POINT count is within [min, max].  Spark's
    ``length`` counts code points (UTF8String.numChars), matching
    Character.codePointCount — unlike LengthFilter, which counts UTF-16
    units (length_filter mirrors that separately)."""
    return F.filter(
        tokens,
        lambda t: (F.length(t) >= F.lit(min_cp)) & (F.length(t) <= F.lit(max_cp)),
    )


def hyphenated_words_filter(tokens: Column) -> Column:
    """HyphenatedWordsFilter (miscellaneous/HyphenatedWordsFilter.java:78-113):
    re-join words broken across lines — every token ending in '-' is held
    and concatenated (hyphen dropped) with following held tokens until a
    non-hyphen-final token completes the word; a trailing unfinished word is
    emitted with its hyphen restored.  Stateful across the token stream, so
    realized as one ``aggregate`` fold over the token array with a
    (pending, out) accumulator — still JVM-side, no UDF.  ``pending`` uses
    NULL as 'no word in progress' (a lone '-' token legitimately pends the
    empty string, matching the reference's savedState != null test)."""
    acc0 = F.struct(
        F.lit(None).cast("string").alias("pending"),
        F.array().cast("array<string>").alias("out"),
    )

    def step(acc: Column, t: Column) -> Column:
        ends_hyphen = t.endswith("-")
        head = F.coalesce(acc["pending"], F.lit(""))
        return (
            F.when(
                ends_hyphen,
                F.struct(
                    F.concat(head, F.substring(t, 1, F.length(t) - 1)).alias("pending"),
                    acc["out"].alias("out"),
                ),
            )
            .when(
                acc["pending"].isNull(),
                F.struct(
                    F.lit(None).cast("string").alias("pending"),
                    F.array_append(acc["out"], t).alias("out"),
                ),
            )
            .otherwise(
                F.struct(
                    F.lit(None).cast("string").alias("pending"),
                    F.array_append(acc["out"], F.concat(acc["pending"], t)).alias("out"),
                )
            )
        )

    def finish(acc: Column) -> Column:
        return F.when(
            acc["pending"].isNotNull(),
            F.array_append(acc["out"], F.concat(acc["pending"], F.lit("-"))),
        ).otherwise(acc["out"])

    return F.aggregate(tokens, acc0, step, finish)


# --- keyword-protection combinators for vocabulary term maps ---------------
# The stemmers integrate as (term -> new_term) maps over the distinct
# vocabulary (stemmer.py porter_stem_map shape).  KeywordMarker /
# StemmerOverride / KeywordRepeat are map TRANSFORMERS in that algebra:


def keyword_marker_map(map_fn, protected: tuple[str, ...]):
    """KeywordMarkerFilterFactory (KeywordMarkerFilter.java): terms in the
    protected set never stem — the wrapped term map drops their rows."""
    def build(vocab):
        from pyspark.sql import functions as FF

        return map_fn(vocab).where(~FF.col("term").isin(*protected))

    return build


def stemmer_override_map(map_fn, overrides: dict[str, str]):
    """StemmerOverrideFilterFactory (StemmerOverrideFilter.java): dictionary
    entries replace the stemmer's output AND keyword-mark the term (the
    stemmer never sees it).  Realized as: override rows win, wrapped-map
    rows apply to everything else."""
    def build(vocab):
        from pyspark.sql import functions as FF

        spark = vocab.sparkSession
        ov = spark.createDataFrame(
            [(k, v) for k, v in overrides.items()], "term string, new_term string"
        )
        base = map_fn(vocab).where(~FF.col("term").isin(*overrides.keys()))
        return base.unionByName(
            ov.join(vocab.select("term"), "term", "left_semi")
        )

    return build


def keyword_repeat_map(map_fn):
    """KeywordRepeatFilterFactory + stemmer (the classic 'index both the
    original and the stem' chain, usually followed by
    RemoveDuplicatesTokenFilter): every changed term maps to BOTH its stem
    and itself.  In term-map algebra: array-valued new_term rows; the index
    builder explodes multi-target maps."""
    def build(vocab):
        from pyspark.sql import functions as FF

        m = map_fn(vocab)
        return m.select("term", "new_term").unionByName(
            m.select("term", FF.col("term").alias("new_term"))
        )

    return build


def upper_case_filter(tokens: Column) -> Column:
    """UpperCaseFilterFactory (lucene/analysis/common/.../core/
    UpperCaseFilter.java) — rarely sensible (the docs warn it breaks
    most downstream filters) but part of the factory registry."""
    return F.transform(tokens, F.upper)


def pattern_capture_group(
    token: str,
    patterns: tuple[str, ...],
    preserve_original: bool = False,
) -> list[str]:
    """PatternCaptureGroupTokenFilter over one token (lucene/analysis/
    common/.../pattern/PatternCaptureGroupTokenFilter.java:108-192):
    emits one token per capture group per match of every pattern,
    interleaved by capture start offset (ties keep pattern order);
    empty captures are skipped, and with preserveOriginal a capture
    equal to the whole token is skipped too (the original already
    stands).  Without preserveOriginal the first capture replaces the
    original; no captures leaves the token unchanged.  All reference
    test sequences (incl. the camelCase pattern stack) in
    tests/test_filters_round4.py."""
    import re as _re

    heads: list[list[tuple[int, int]]] = []
    n = len(token)
    for p in patterns:
        pr = _re.compile(p)
        seq: list[tuple[int, int]] = []
        if pr.groups:
            for m in pr.finditer(token):
                for g in range(1, pr.groups + 1):
                    st, en = m.start(g), m.end(g)
                    if st < 0 or st == en:
                        continue
                    if preserve_original and st == 0 and en == n:
                        continue
                    seq.append((st, en))
        heads.append(seq)
    idx = [0] * len(heads)
    out: list[str] = []
    while True:
        best, best_start = -1, None
        for i, seq in enumerate(heads):
            if idx[i] < len(seq):
                st = seq[idx[i]][0]
                if best_start is None or st < best_start:
                    best_start, best = st, i
        if best < 0:
            break
        st, en = heads[best][idx[best]]
        idx[best] += 1
        out.append(token[st:en])
    if preserve_original:
        return [token] + out
    return out if out else [token]
